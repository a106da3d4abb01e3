package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.html.HtmlFuncs

/** Dow-30 seed-table builder (reference src/scrapers/get30DowTickers.py):
  * scrape the constituents wikitable, map columns by header keyword,
  * left-join the ticker→IR-URL dimension (J2), sink as CSV (S12).
  */
object Seed {

  /** Header keyword → canonical column (reference :104-141). */
  val headerKeywords: Map[String, Seq[String]] = Map(
    "ticker" -> Seq("symbol", "ticker"),
    "company" -> Seq("company", "name"),
    "sector" -> Seq("industry", "sector"))

  /** @param pages DataFrame(html) containing the constituents table.
    * @return DataFrame(ticker, company, sector)
    */
  def companiesFromWikitable(spark: SparkSession, pages: DataFrame): DataFrame = {
    val rows = pages.select(
      HtmlFuncs.extract_tables(col("html"))
        .as(Seq("table_index", "row_index", "cells")))

    // header row decides the column position per canonical name
    val header = rows.filter(col("row_index") === 0)
      .select(col("table_index"), col("cells").as("header"))
    val positioned = rows.filter(col("row_index") > 0)
      .join(header, Seq("table_index"))

    def pos(canonical: String): org.apache.spark.sql.Column =
      headerKeywords(canonical)
        .map(k => array_position(
          transform(col("header"), h => lower(h)), lit(k)).cast("int"))
        .reduce((a, b) => when(a > 0, a).otherwise(b))

    positioned
      .withColumn("p_ticker", pos("ticker"))
      .withColumn("p_company", pos("company"))
      .withColumn("p_sector", pos("sector"))
      .filter(col("p_ticker") > 0 && col("p_company") > 0)
      .select(
        trim(element_at(col("cells"), col("p_ticker"))).as("ticker"),
        trim(element_at(col("cells"), col("p_company"))).as("company"),
        when(col("p_sector") > 0,
          trim(element_at(col("cells"), col("p_sector"))))
          .otherwise(lit(null)).as("sector"))
      .filter(length(col("ticker")) > 0)
  }

  /** J2: attach IR URLs from a small dimension (broadcast left join —
    * the Spark form of the reference's 30-entry literal dict map,
    * :145-186).
    */
  def withIrUrls(companies: DataFrame, irUrls: DataFrame): DataFrame =
    companies.join(
      broadcast(irUrls.select(col("ticker"), col("ir_url"))),
      Seq("ticker"), "left")

  /** S12: header CSV sink. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** S13: Excel sink for the seed table — the reference's
    * `df.to_excel('dow30_companies.xlsx')`
    * (src/scrapers/get30DowTickers.py:243).
    */
  def writeExcel(df: DataFrame, path: String): Unit =
    graft.io.ExcelSink.write(df, path, sheetName = "Dow30")
}

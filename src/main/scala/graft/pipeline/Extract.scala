package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.LinkFuncs

/** Deterministic latest-quarter report selection — the relational
  * equivalent of the reference's LLM extraction prompt ("Extract the
  * documents for the latest financial quarter only",
  * /root/reference/src/extract_reports.py:133), encoding the
  * tie-breaking rules of the scraper's quarter filter
  * (src/enhanced_selenium_scraper.py:373-425):
  *
  *  - year/quarter parsed from text ∥ title ∥ url (U5)
  *  - latest = struct-max (year, quarter), quarter defaulting to 4
  *    when absent within the max year (A2, :410-411)
  *  - accept a document iff its year is null (unknown dates pass) or
  *    (year, coalesce(quarter, 4)) ≥ (latest_year, latest_quarter) (W4)
  *  - old-PDF guard: drop PDFs with a known year < minYear (P6)
  */
object Extract {

  /** Document rows with parsed (year, quarter) — the U5 extraction
    * stage of `latestQuarterReports`, exposed so callers (e.g. the q40
    * oracle materialization) can checkpoint the pre-selection table.
    */
  def docsWithYearQuarter(links: DataFrame, maxYear: Int): DataFrame = {
    val hasCompany = links.columns.contains("company")
    links
      .filter(col("link_type") === "document")
      .dropDuplicates((if (hasCompany) Seq("company") else Nil) :+ "url")
      .withColumn("yq", LinkFuncs.extractYearQuarter(
        concat_ws(" ", col("text"), col("title"), col("url")), maxYear))
      .withColumn("year", col("yq.year"))
      .withColumn("quarter", col("yq.quarter"))
      .drop("yq")
  }

  /** @param links DocumentLink rows, optionally with a `company` column
    *              (per-company latest computed when present).
    */
  def latestQuarterReports(links: DataFrame, maxYear: Int,
                           minYear: Int = 2023): DataFrame = {
    val hasCompany = links.columns.contains("company")
    val keyCols = if (hasCompany) Seq(col("company")) else Seq(lit(1).as("g"))

    val docs = docsWithYearQuarter(links, maxYear)
      // P6: old-PDF filter — known-old PDFs never qualify
      .filter(!(col("file_extension") === "pdf" &&
        col("year").isNotNull && col("year") < minYear))

    // A2: latest_year = max known year; latest_quarter = max known
    // quarter *within* that year, defaulting to 4 when no link in the
    // max year carries a quarter (reference :400-425). The struct-max
    // with null-quarter→-1 computes both in one aggregation: the max
    // struct is (maxYear, maxQuarterWithinMaxYear | -1).
    val latest = docs
      .filter(col("year").isNotNull)
      .groupBy(keyCols: _*)
      .agg(max(struct(col("year"),
        coalesce(col("quarter"), lit(-1)).as("quarter"))).as("latest"))
      .select(keyCols.map(c => c) :+
        col("latest.year").as("latest_year") :+
        when(col("latest.quarter") === -1, 4)
          .otherwise(col("latest.quarter")).as("latest_quarter"): _*)

    // left join so a corpus with no dated links still flows through
    // (latest_* null → null-permissive acceptance admits everything)
    val joined =
      if (hasCompany) docs.join(broadcast(latest), Seq("company"), "left")
      else docs.withColumn("g", lit(1))
        .join(broadcast(latest), Seq("g"), "left").drop("g")

    // W4: acceptance with null-permissive rules — unknown year passes;
    // within the latest year an unknown quarter passes (reference
    // :373-398); older years/quarters are dropped. latest_year null
    // (no dated links at all) → everything passes.
    joined
      .filter(col("latest_year").isNull || col("year").isNull ||
        (col("year") === col("latest_year") &&
          (col("quarter").isNull || col("quarter") >= col("latest_quarter"))) ||
        col("year") > col("latest_year"))
      .select(
        (if (hasCompany) Seq(col("company")) else Nil) ++ Seq(
          when(length(trim(col("text"))) > 0, trim(col("text")))
            .otherwise(col("title")).as("title"),
          col("document_type").as("category"),
          col("url"),
          // J1 enrichment fields ride along for the download stage
          col("source_url"),
          col("file_extension"),
          // docs selected for the latest quarter are labeled with it
          // when their own year/quarter is unknown — mirroring the
          // LLM's labeling of every selected doc with the quarter it
          // was asked for (src/extract_reports.py:133)
          coalesce(col("year"), col("latest_year"), lit(maxYear)).as("year"),
          coalesce(col("quarter"), col("latest_quarter"), lit(4)).as("quarter")): _*)
  }
}

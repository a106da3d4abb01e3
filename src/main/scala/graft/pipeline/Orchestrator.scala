package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.services.{Downloader, FileResult, PageFetcher}

/** End-to-end pipeline (reference src/orchestrator.py:54-243) as one
  * Dataset program: crawl → extract → enrich → download → metadata.
  * The reference's thread-pool fan-out becomes task parallelism over a
  * companies DataFrame repartitioned to the worker budget; the
  * inter-stage files-on-disk handoff becomes plain DataFrame lineage
  * (the "shuffle as filesystem" anti-pattern disappears).
  */
object Orchestrator {

  final case class DownloadRow(
      company: String, url: String, title: String, category: String,
      year: Int, quarter: Int, source_url: String, file_extension: String)

  /** Stage 3: distributed download via per-partition service clients
    * (SURVEY U8) — `mapPartitions`, never an expression, so the planner
    * can't reorder the side effect.
    */
  def download(spark: SparkSession, reports: DataFrame,
               downloader: Downloader, destRoot: String): DataFrame = {
    import spark.implicits._
    val rows = reports.select(
      col("company"), col("url"), col("title"), col("category"),
      col("year"), col("quarter"),
      coalesce(col("source_url"), lit("")).as("source_url"),
      coalesce(col("file_extension"), lit("")).as("file_extension"))
      .as[DownloadRow]
    rows.mapPartitions { it =>
      it.map { r =>
        // Reference filename chain (download_reports.py:389-418): no
        // response headers exist pre-request, so the known metadata
        // extension stands in for Content-Type in the inference step.
        val ctHint = r.file_extension match {
          case "pdf" => "application/pdf"
          case "html" | "htm" => "text/html"
          case "xlsx" => "application/vnd.ms-excel"
          case "zip" => "application/zip"
          case "docx" => "application/msword"
          case "txt" => "text/plain"
          case _ => ""
        }
        val fname = graft.services.FilenameKernel.build(
          r.url, "", ctHint, r.title, r.year, r.quarter)
        val res: FileResult =
          downloader.download(r.url, s"$destRoot/${r.company}", fname)
        (r.company, r.url, r.title, r.category, r.year, r.quarter,
          r.source_url, r.file_extension, res.path, res.size, res.checksum,
          res.contentType, res.ok, res.error)
      }
    }.toDF("company", "url", "title", "category", "year", "quarter",
      "source_url", "file_extension", "file_path", "file_size", "checksum",
      "content_type", "success", "error")
  }

  /** A10: per-company nested metadata document — `collect_list(struct)`
    * replaces the reference's mutable collector object
    * (src/simple_metadata_collector.py:36-130).
    */
  def metadata(companies: DataFrame, stats: DataFrame,
               downloads: DataFrame, modelUsed: String): DataFrame = {
    val files = downloads.groupBy(col("company")).agg(
      collect_list(struct(
        col("title"), col("file_size").as("size"), col("checksum"),
        col("quarter"), col("year"), col("url"),
        col("source_url").as("source_page"),
        col("file_extension").as("file_type"),
        col("success"))).as("downloaded_files"),
      sum(when(col("success"), 1).otherwise(0)).as("n_downloaded"),
      sum(when(!col("success"), 1).otherwise(0)).as("n_failed"))
    companies
      .join(stats, Seq("company"), "left")
      .join(files, Seq("company"), "left")
      .withColumn("urls_visited", coalesce(col("urls_visited"), lit(0L)))
      .withColumn("urls_found", coalesce(col("urls_found"), lit(0L)))
      .withColumn("downloaded_files",
        coalesce(col("downloaded_files"), array()))
      .withColumn("n_downloaded", coalesce(col("n_downloaded"), lit(0L)))
      .withColumn("n_failed", coalesce(col("n_failed"), lit(0L)))
      .withColumn("status",
        when(col("n_failed") === 0, "completed").otherwise("failed"))
      .withColumn("model_used", lit(modelUsed))
  }

  /** Full pipeline over fixture-backed services. */
  def run(spark: SparkSession, companies: DataFrame, fetcher: PageFetcher,
          downloader: Downloader, destRoot: String, maxYear: Int): DataFrame = {
    val seeds = companies.select(col("company"), col("ir_url").as("url"))
    val links = Crawl.crawl(spark, seeds, fetcher)
    val stats = Crawl.crawlStats(links)
    val reports = Extract.latestQuarterReports(
      links.withColumnRenamed("href", "url"), maxYear)
    val downloads = download(spark, reports, downloader, destRoot)
    metadata(companies, stats, downloads, modelUsed = "rule-based")
  }
}

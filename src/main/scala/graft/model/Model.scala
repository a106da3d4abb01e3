package graft.model

import java.sql.Timestamp

/** Typed record surface (SURVEY §1.1) — the reference's five entity
  * shapes as case classes with Spark `Encoder`s via `spark.implicits`.
  */

/** dow30_companies.csv row (reference src/orchestrator.py:245-261). */
final case class Company(
    ticker: String,
    company: String,
    sector: Option[String],
    investor_relations_url: String,
    last_updated: Option[Timestamp])

/** Harvested link (reference src/enhanced_selenium_scraper.py:41-120). */
final case class DocumentLink(
    href: String,
    text: String,
    title: String,
    link_type: String,
    full_html: String,
    source_url: String,
    file_extension: String,
    document_type: String)

/** LLM structured-output row (reference src/extract_reports.py:68-73). */
final case class Report(
    title: String,
    category: String,
    url: String,
    year: Int,
    quarter: Int)

/** Per-file download record (reference src/simple_metadata_collector.py:147-166). */
final case class FileMetadata(
    filename: String,
    file_path: String,
    file_size: Long,
    url: String,
    title: String,
    category: String,
    year: Int,
    quarter: Int,
    download_timestamp: String,
    source_url: String,
    file_extension: String,
    checksum: String,
    success: Boolean)

/** Per-company pipeline run document (reference
  * src/simple_metadata_collector.py:40-58) — the one nested type.
  */
final case class PipelineMetadata(
    company: String,
    ticker: String,
    ir_url: String,
    pipeline_start_time: String,
    pipeline_end_time: String,
    status: String,
    error_message: Option[String],
    urls_visited: Int,
    urls_found: Int,
    model_used: String,
    downloaded_files: Seq[FileMetadata])

/** IR-discovery result row (reference src/scrapers/find_IR_pgs_v1.py:538-544). */
final case class IRPageResult(
    ticker: String,
    company: String,
    website: String,
    ir_url: String,
    status: String)

package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Download-stage filename derivation as pure column logic (reference
  * src/download_reports.py:349-418):
  *
  *  - RFC 6266/5987 Content-Disposition filename parsing
  *    (`_filename_from_content_disposition`, :349-363)
  *  - content-type → extension inference with URL-path preference
  *    (`_extension_from_content_type`, :365-387)
  *  - the filename priority chain metadata-name → Content-Disposition →
  *    URL last segment → `download{ext}` (`_build_target_filename`,
  *    :389-418), sanitized like the reference's final `re.sub` (:536).
  *
  * Everything is `org.apache.spark.sql.functions` regex/conditional
  * column logic — codegen-friendly, no UDFs — so filename resolution for
  * billions of download rows stays inside whole-stage codegen and never
  * leaves the executors. `graft.services.FilenameKernel` is the
  * row-at-a-time mirror for service-side use; `FilenameConsistencySpec`
  * pins the two together.
  */
object DownloadFuncs {

  /** Last path segment of a URL after stripping trailing slashes —
    * `os.path.basename(urlparse(url).path.rstrip("/"))`.
    */
  def urlLastSegment(url: Column): Column = {
    val path = when(url.contains("://"),
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      .otherwise(regexp_extract(url, "^([^?#]*)", 1))
    regexp_extract(regexp_replace(path, "/+$", ""), "([^/]*)$", 1)
  }

  /** Extension (with dot) of a path segment, '' if none — mirrors
    * `os.path.splitext`: a leading dot alone is not an extension.
    */
  private def segmentExt(seg: Column): Column =
    regexp_extract(seg, ".+(\\.[^.]+)$", 1)

  /** Filename from an RFC 6266 Content-Disposition header: prefer the
    * RFC 5987 `filename*=charset'lang'value` form, fall back to plain
    * `filename=`; null when neither yields a name. Regexes mirror the
    * reference's (download_reports.py:356-363) including its quirk of
    * requiring a non-empty language tag in the `filename*` form.
    */
  def cdFilename(cd: Column): Column = {
    val star = trim(regexp_replace(trim(
      regexp_extract(coalesce(cd, lit("")),
        "(?i)filename\\*\\s*=\\s*[^']+'[^']+'\\s*([^;]+)", 1)),
      "^\"+|\"+$", ""))
    val plain = trim(regexp_extract(coalesce(cd, lit("")),
      "(?i)filename\\s*=\\s*\"?([^\";]+)\"?", 1))
    when(length(star) > 0, star)
      .when(length(plain) > 0, plain)
  }

  /** Best-effort extension from Content-Type, preferring a real URL
    * path extension (download_reports.py:365-387; same match order).
    */
  def extensionFromContentType(contentType: Column, lastSegment: Column): Column = {
    val ct = lower(coalesce(contentType, lit("")))
    val urlExt = segmentExt(lastSegment)
    when(length(urlExt) > 0, urlExt)
      .when(ct.contains("pdf"), lit(".pdf"))
      .when(ct.contains("html") || ct.contains("htm"), lit(".html"))
      .when(ct.contains("spreadsheetml") || ct.contains("excel") ||
        ct.contains("xlsx"), lit(".xlsx"))
      .when(ct.contains("zip"), lit(".zip"))
      .when(ct.contains("msword") || ct.contains("wordprocessingml") ||
        ct.contains("docx"), lit(".docx"))
      .when(ct.contains("plain") || ct.contains("text/"), lit(".txt"))
      .otherwise(lit(".bin"))
  }

  /** The full target-filename priority chain
    * (download_reports.py:389-418), sanitized (:536):
    *  1. `{title}_{year}Q{quarter}{ext}` when all three are truthy;
    *  2. Content-Disposition filename;
    *  3. URL last segment (extension appended when missing);
    *  4. `download{ext}`.
    */
  def buildFilename(url: Column, contentDisposition: Column, contentType: Column,
                    title: Column, year: Column, quarter: Column): Column = {
    val seg = urlLastSegment(url)
    val ext = extensionFromContentType(contentType, seg)
    val cdName = cdFilename(contentDisposition)
    val raw =
      when(coalesce(title, lit("")) =!= "" &&
           year.isNotNull && year =!= 0 &&
           quarter.isNotNull && quarter =!= 0,
        concat(title, lit("_"), year.cast("string"),
          lit("Q"), quarter.cast("string"), ext))
      .when(cdName.isNotNull, cdName)
      .when(length(seg) > 0,
        when(length(segmentExt(seg)) > 0, seg).otherwise(concat(seg, ext)))
      .otherwise(concat(lit("download"), ext))
    LinkFuncs.sanitizeFilename(raw)
  }
}

package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unicode is spelled with explicit escapes throughout: combining vs
  * precomposed forms must not depend on any editor's normalization of
  * this source file.
  */
class NormFuncsSpec extends SparkTestBase {

  private val eComb = "\u0065\u0301" // e + COMBINING ACUTE ACCENT
  private val ePre = "\u00E9" // precomposed LATIN SMALL LETTER E ACUTE
  private val uUml = "\u00FC" // precomposed u-umlaut
  private val uUmlComb = "\u0075\u0308" // u + combining diaeresis

  test("nfc kernel: composes combining sequences, identity on NFC input") {
    assert(NormKernels.nfc(eComb) == ePre)
    assert(NormKernels.nfc("\u0041\u030Angstrom") == "\u00C5ngstrom")
    val already = "Caf" + ePre + " ASCII"
    assert(NormKernels.nfc(already) eq already) // isNormalized fast path
    assert(NormKernels.nfc(null) == null)
    assert(NormKernels.nfc(NormKernels.nfc(eComb + "x")) == ePre + "x")
  }

  test("nfkc kernel: folds ligatures, fullwidth forms, fractions") {
    assert(NormKernels.nfkc("\uFB01le") == "file") // fi ligature
    assert(NormKernels.nfkc("\uFF21\uFF22") == "AB") // fullwidth A B
    assert(NormKernels.nfkc("\u00BD") == "1\u20442") // vulgar one-half
    assert(NormKernels.nfkc(eComb) == ePre) // still composes
    assert(NormKernels.nfkc(null) == null)
  }

  test("stripAccents kernel: removes marks from either spelling") {
    // precomposed and combining spellings both land on the bare letter
    assert(NormKernels.stripAccents("M" + uUml + "hleisen") == "Muhleisen")
    assert(NormKernels.stripAccents("M" + uUmlComb + "hleisen") == "Muhleisen")
    assert(NormKernels.stripAccents(
      "Caf" + ePre + " Nu\u00F1ez") == "Cafe Nunez")
    // compatibility chars are NOT folded (that's nfkc's job)
    assert(NormKernels.stripAccents("\uFB01\u00BD\u0153") == "\uFB01\u00BD\u0153")
    // no-mark input comes back NFC-normalized, content unchanged
    assert(NormKernels.stripAccents("plain ASCII") == "plain ASCII")
    assert(NormKernels.stripAccents(null) == null)
  }

  test("cleanText kernel: controls stripped, whitespace collapsed, trimmed") {
    assert(NormKernels.cleanText("ab\u0001c\t\nd  e ") == "abc d e")
    assert(NormKernels.cleanText("  lead\t\ttab\r\nnewline  ")
      == "lead tab newline")
    assert(NormKernels.cleanText("x\u000B\u000Cy") == "xy")
    assert(NormKernels.cleanText("a \u007F  bc") == "a bc")
    // U+00A0 (non-breaking space) is deliberately untouched: parity
    // with the oracle's space-only trim
    assert(NormKernels.cleanText("a\u00A0b") == "a\u00A0b")
    assert(NormKernels.cleanText(null) == null)
    // idempotent
    val once = NormKernels.cleanText(" a  b ")
    assert(NormKernels.cleanText(once) == once)
  }

  test("expressions run under codegen in DataFrames and SQL") {
    import spark.implicits._
    val messy = eComb + " M" + uUmlComb + "hle \u0001 x"
    val df = Seq(messy).toDF("s")
    val row = df.select(
      NormFuncs.nfc_norm($"s").as("nfc"),
      NormFuncs.nfkc_norm($"s").as("nfkc"),
      NormFuncs.strip_accents($"s").as("plain"),
      NormFuncs.clean_text($"s").as("clean")).head
    assert(row.getString(0) == ePre + " M" + uUml + "hle \u0001 x")
    assert(row.getString(1) == ePre + " M" + uUml + "hle \u0001 x")
    assert(row.getString(2) == "e Muhle \u0001 x")
    assert(row.getString(3) == eComb + " M" + uUmlComb + "hle x")
    // SQL registration via GraftExtensions
    df.createOrReplaceTempView("norm_t")
    val sqlRow = spark.sql(
      "SELECT nfc_norm(s) a, nfkc_norm(s) b, strip_accents(s) c, " +
        "clean_text(s) d FROM norm_t").head
    assert(sqlRow.getString(0) == row.getString(0))
    assert(sqlRow.getString(2) == row.getString(2))
    assert(sqlRow.getString(3) == row.getString(3))
  }

  test("null propagation through the expressions") {
    import spark.implicits._
    val df = Seq[Option[String]](None).toDF("s")
    val row = df.select(
      NormFuncs.nfc_norm($"s"), NormFuncs.nfkc_norm($"s"),
      NormFuncs.strip_accents($"s"), NormFuncs.clean_text($"s")).head
    (0 to 3).foreach(i => assert(row.isNullAt(i)))
  }

  test("normalization closes the exact-dedup identity gap") {
    import spark.implicits._
    // same rendered text, two byte spellings: raw md5 differs,
    // NFC md5 agrees, which is why this tier runs before dedup.
    val df = Seq("Caf" + ePre, "Caf" + eComb).toDF("text")
    val raw = df.select(md5($"text")).distinct.count
    val norm = df.select(md5(NormFuncs.nfc_norm($"text"))).distinct.count
    assert(raw == 2 && norm == 1)
  }
}

package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch kernels for near-duplicate detection at scale: MinHash over
  * character shingles and 64-bit SimHash over tokens. Both are single
  * pass over the document — O(len · numHashes) with no allocation per
  * shingle — and return fixed-size sketches, so the shuffle that
  * follows (LSH band grouping) moves `numHashes × 8` bytes per doc
  * instead of the document text. That is what makes the dedup join
  * feasible at 100 TB: documents never co-locate, only sketches do.
  */
object SketchKernels {
  /** 64-bit avalanche mix (splitmix64 finalizer — public domain). */
  @inline def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Whitespace-collapse normalization, shared by the sketch kernels.
    * Precompiled once: `String.replaceAll` recompiles its pattern on
    * EVERY call, which at one call per document turns the sketch pass
    * from I/O-bound into regex-compile-bound.
    */
  private val ws = java.util.regex.Pattern.compile("\\s+")
  @inline def normalize(text: String): String =
    ws.matcher(text.toLowerCase).replaceAll(" ")

  /** MinHash signature via densified one-permutation hashing
    * (Shrivastava & Li, ICML 2014): each k-char shingle is hashed ONCE,
    * routed to one of `n` bins by its top bits, and the min hash per
    * bin is kept; empty bins borrow from the nearest non-empty bin to
    * the right (rotation densification), which keeps the collision
    * probability equal to the Jaccard similarity. O(len) per document
    * instead of the classic O(len · n) — the difference between the
    * sketch pass being free and being the bottleneck at corpus scale.
    */
  def minhash(text: String, k: Int, n: Int): Array[Long] = {
    val sig = Array.fill(n)(Long.MaxValue)
    if (text == null) return sig
    val t = normalize(text)
    val len = t.length
    if (len == 0) return sig
    val upper = math.max(len - k + 1, 1)
    var i = 0
    while (i < upper) {
      // polynomial rolling hash of the shingle
      var h = 1125899906842597L
      var j = i
      val end = math.min(i + k, len)
      while (j < end) { h = 31 * h + t.charAt(j); j += 1 }
      val v = mix64(h)
      val bin = ((v >>> 1) % n).toInt
      if (v < sig(bin)) sig(bin) = v
      i += 1
    }
    // rotation densification: every empty bin copies the nearest
    // filled bin to its right (cyclically)
    var firstFilled = -1
    var p = 0
    while (p < n && firstFilled < 0) {
      if (sig(p) != Long.MaxValue) firstFilled = p
      p += 1
    }
    if (firstFilled >= 0) {
      var last = sig(firstFilled)
      var q = 0
      while (q < n) {
        val pos = (firstFilled + n - q) % n
        if (sig(pos) == Long.MaxValue) sig(pos) = last
        else last = sig(pos)
        q += 1
      }
    }
    sig
  }

  /** 64-bit SimHash over whitespace tokens: per-token 64-bit hash votes
    * on each bit; the sign of the vote sum forms the fingerprint.
    */
  def simhash64(text: String): Long = simhash64Seeded(text, 0L)

  /** 128-bit SimHash as two independently-seeded 64-bit halves — the
    * corpus-scale fingerprint: 32-bit bands over 128 bits give 2^32
    * buckets where 16-bit bands over 64 bits max out at 65k (every
    * bucket hot on a large corpus).
    */
  def simhash128(text: String): GenericArrayData =
    new GenericArrayData(Array(
      simhash64Seeded(text, 0L),
      simhash64Seeded(text, 0x9e3779b97f4a7c15L)))

  def simhash64Seeded(text: String, seed: Long): Long = {
    if (text == null) return 0L
    val counts = new Array[Int](64)
    var start = 0
    val t = text.toLowerCase
    val len = t.length
    var i = 0
    while (i <= len) {
      if (i == len || Character.isWhitespace(t.charAt(i))) {
        if (i > start) {
          var h = 1125899906842597L ^ seed
          var j = start
          while (j < i) { h = 31 * h + t.charAt(j); j += 1 }
          h = mix64(h)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** [[minhash]] boxed for Catalyst (also the codegen entry point). */
  def minhashArray(text: String, k: Int, n: Int): GenericArrayData =
    new GenericArrayData(minhash(text, k, n))

  /** Fraction of equal components between two equal-length signatures
    * — the MinHash estimate of Jaccard similarity.
    */
  def signatureSimilarity(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }
}

/** `minhash_signature(text)` → array<bigint> of length `numHashes`.
  * Generates code calling the static kernel so the surrounding
  * projection stays inside one whole-stage-codegen span.
  */
case class MinHashSignature(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_signature"
  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhashArray(
      input.asInstanceOf[UTF8String].toString, shingleSize, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.llmops.SketchKernels.minhashArray($c.toString(), $shingleSize, $numHashes);")
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** `simhash64(text)` → bigint fingerprint (codegen'd). */
case class SimHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash64(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.llmops.SketchKernels.simhash64($c.toString());")
  override protected def withNewChildInternal(c: Expression): SimHash =
    copy(child = c)
}

/** `simhash128(text)` → array<bigint>[2] fingerprint (codegen'd). */
case class SimHash128(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash128"
  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash128(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.llmops.SketchKernels.simhash128($c.toString());")
  override protected def withNewChildInternal(c: Expression): SimHash128 =
    copy(child = c)
}

object Sketches {
  /** Column wrapper: MinHash signature of a text column. */
  def minhash_signature(text: Column, shingleSize: Int = 5, numHashes: Int = 128): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(text), shingleSize, numHashes))

  /** Column wrapper: 64-bit SimHash of a text column. */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(text)))

  /** LSH band keys for a signature: `bands` rows of `rowsPerBand`
    * signature entries, each band hashed to one long. Explode the
    * result and group by (band_index, band_hash) — only docs sharing a
    * band bucket are ever compared, which replaces the O(N²) pairwise
    * scan with a per-bucket join.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b => struct(
      lit(b).as("band"),
      xxhash64(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))
        .as("band_hash"))): _*)

  /** Estimated Jaccard similarity between two signature columns. */
  def signatureSim(a: Column, b: Column): Column = {
    val eq = size(filter(zip_with(a, b, (x, y) => x === y), v => v))
    eq / size(a).cast("double")
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** 16-bit SimHash bands (4 per fingerprint) for banded candidate
    * generation: two docs within Hamming distance 3 share at least one
    * of the 4 bands (pigeonhole).
    */
  def simhashBands(fp: Column): Column =
    array((0 until 4).map(b => struct(
      lit(b).as("band"),
      shiftright(fp, b * 16).bitwiseAND(lit(0xffffL)).as("band_hash"))): _*)

  /** Column wrapper: 128-bit SimHash (two seeded 64-bit halves). */
  def simhash128(text: Column): Column =
    ColumnBridge.column(SimHash128(ColumnBridge.expression(text)))

  /** 32-bit bands (4 per 128-bit fingerprint): docs within Hamming
    * distance 3 of each other's 128-bit fingerprints share ≥1 band
    * (pigeonhole), and 2^32 bucket keys stay sparse at corpus scale
    * where the 16-bit variant saturates.
    */
  def simhash128Bands(fp: Column): Column =
    array((0 until 4).map(b => struct(
      lit(b).as("band"),
      shiftright(element_at(fp, b / 2 + 1), (b % 2) * 32)
        .bitwiseAND(lit(0xffffffffL)).as("band_hash"))): _*)

  /** Hamming distance between two 128-bit (two-half) fingerprints. */
  def hamming128(a: Column, b: Column): Column =
    hamming64(element_at(a, 1), element_at(b, 1)) +
      hamming64(element_at(a, 2), element_at(b, 2))
}

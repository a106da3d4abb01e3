package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Content-defined chunking. The pins that make CDC CDC: exact
  * coverage under the min/max bounds, determinism, and the two
  * properties fixed-size chunking cannot have — shift resistance
  * (a prefix insertion leaves later chunk identities intact) and edit
  * locality (one flipped byte invalidates only the chunks around it).
  */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random word text, ~6 bytes/word
  private def words(seed: Long, n: Int): String = {
    var z = seed
    def next(): Long = {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    (1 to n).map(_ => java.lang.Long.toHexString(
      math.abs(next()) % 0xFFFFFL)).mkString(" ")
  }

  private def spansOf(text: String) =
    Cdc.chunkSpans(text.getBytes("UTF-8"), maskBits = 6, minSize = 16,
      maxSize = 256)

  test("chunks cover the byte range exactly under the size bounds") {
    val text = words(42L, 400)
    val bytes = text.getBytes("UTF-8")
    val spans = spansOf(text)
    assert(spans.nonEmpty)
    assert(spans.head._1 == 0)
    assert(spans.map(_._2).sum == bytes.length)
    spans.sliding(2).foreach {
      case Array(a, b) => assert(b._1 == a._1 + a._2, "gap or overlap")
      case _ =>
    }
    spans.foreach { case (_, len, _) => assert(len <= 256) }
    spans.dropRight(1).foreach { case (_, len, _) => assert(len >= 16) }
    assert(Cdc.chunkSpans(Array.emptyByteArray, 6, 16, 256).isEmpty)
  }

  test("shift resistance: a prefix insertion preserves most chunk " +
    "identities (fixed-size chunking preserves none)") {
    val doc = words(7L, 500)
    val shifted = "inserted preamble of uneven length " + doc
    val h0 = spansOf(doc).map(_._3).toSet
    val h1 = spansOf(shifted).map(_._3).toSet
    val shared = (h0 intersect h1).size
    assert(shared >= h0.size - 3,
      s"only $shared/${h0.size} chunk identities survived the shift")
    // fixed-size chunking under the same shift: alignment is destroyed
    val bytes = doc.getBytes("UTF-8")
    val sBytes = shifted.getBytes("UTF-8")
    def fixedHashes(bs: Array[Byte]) = bs.grouped(64)
      .map(g => java.util.Arrays.hashCode(g)).toSet
    val fShared = (fixedHashes(bytes) intersect fixedHashes(sBytes)).size
    assert(fShared <= 1, s"fixed-size chunks unexpectedly aligned: $fShared")
  }

  test("edit locality: one flipped character invalidates only the " +
    "chunks around the edit") {
    val doc = words(13L, 500)
    val mid = doc.length / 2
    val edited = doc.substring(0, mid) + "X" + doc.substring(mid + 1)
    val a = spansOf(doc).map(_._3)
    val b = spansOf(edited).map(_._3)
    val changed = (a.toSet diff b.toSet).size
    assert(changed >= 1 && changed <= 3,
      s"$changed chunks changed for a 1-byte edit")
  }

  test("DataFrame face: per-chunk rows, deterministic under " +
    "repartitioning; null/empty text yields no rows") {
    val docs = Seq(
      (1L, words(1L, 300)),
      (2L, words(2L, 50)),
      (3L, "")).toDF("doc_id", "text")
    val got = Cdc.cdcChunks(docs)
      .select($"doc_id", $"chunk_idx", $"start", $"len", $"chunk_hash")
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(!got.exists(_.head == 3L)) // empty text: zero chunks
    val again = Cdc.cdcChunks(docs.repartition(5))
      .select($"doc_id", $"chunk_idx", $"start", $"len", $"chunk_hash")
      .collect().map(_.toSeq).toSet
    assert(got == again)
    // spans agree with the kernel
    val k = spansOf(words(2L, 50))
    val df2 = got.filter(_.head == 2L).toSeq.sortBy(_(1).asInstanceOf[Int])
    assert(df2.map(r => (r(2), r(3), r(4))) ==
      k.toSeq.map(s => (s._1, s._2, s._3)))
  }

  test("repeated regions across documents share chunk hashes (the " +
    "storage-dedup payoff)") {
    val shared = words(99L, 200)
    val docs = Seq(
      (1L, words(5L, 60) + " " + shared),
      (2L, words(6L, 90) + " " + shared)).toDF("doc_id", "text")
    val dup = Cdc.cdcChunks(docs)
      .groupBy($"chunk_hash")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" > 1).count()
    assert(dup >= 2, s"shared region produced only $dup cross-doc chunks")
  }
}

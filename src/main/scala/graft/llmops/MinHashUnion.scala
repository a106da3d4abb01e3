package graft.llmops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Corpus-level MinHash union — the custom typed aggregate of the U10
  * surface: element-wise min over per-document signatures yields the
  * signature OF THE UNION of the documents' shingle sets (min commutes
  * with set union). Per group this gives a fixed 8·n-byte corpus
  * sketch, so cross-corpus similarity (per-source overlap, dedup
  * between crawl snapshots) is a constant-size comparison no matter
  * how many documents the group holds. The merge is associative and
  * commutative → full map-side partial aggregation.
  */
object MinHashUnion {

  final class UnionAgg(n: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(n)(Long.MaxValue)
    override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
      var i = 0
      val m = math.min(n, sig.length)
      while (i < m) {
        val v = sig(i)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Untyped-agg form: `df.groupBy(k).agg(MinHashUnion.agg(col("sig")))`. */
  def agg(sig: Column, n: Int = 128): Column =
    udaf(new UnionAgg(n), ExpressionEncoder[Seq[Long]]()).apply(sig)
      .as("union_sig")
}

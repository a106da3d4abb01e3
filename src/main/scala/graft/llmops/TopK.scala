package graft.llmops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact distributed top-k as a bounded-buffer typed aggregate.
  *
  * The rank-window formulation of per-group top-k
  * (`row_number().over(partitionBy(g).orderBy(score))`) shuffles EVERY
  * scored row into |groups| reducers — the bottleneck the round-1
  * review flagged for the brute-force cosine query at 100 TB. This
  * aggregate keeps at most k candidates per partition per group
  * (map-side partial aggregation), so the exchange carries
  * ≤ partitions·|groups|·k slim (id, score) pairs and the merge is a
  * k-way sorted-list merge. Results are identical to the window (it is
  * exact — top-k of a union is the top-k of per-part top-ks); only the
  * plan shape changes.
  */
object TopK {

  type Entry = (Long, Double) // (id, score)

  /** score desc, id asc — the same ordering the window formulation uses
    * (`orderBy(sim.desc, id)`), so results are bit-identical.
    */
  private def beats(a: Entry, b: Entry): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  final class TopKAgg(k: Int)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    override def zero: Seq[Entry] = Vector.empty

    override def reduce(buf: Seq[Entry], x: Entry): Seq[Entry] =
      if (buf.size >= k && !beats(x, buf.last)) buf
      else {
        val i = buf.indexWhere(e => beats(x, e)) match {
          case -1 => buf.size
          case j => j
        }
        (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
      }

    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] = {
      // merge two k-sorted lists, keep k
      val out = Vector.newBuilder[Entry]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.size || j < b.size)) {
        if (j >= b.size || (i < a.size && beats(a(i), b(j)))) {
          out += a(i); i += 1
        } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(buf: Seq[Entry]): Seq[Entry] = buf
    override def bufferEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
  }

  /** `df.groupBy(g).agg(TopK.topK(idCol, scoreCol, k))` → array of
    * (id, score) structs sorted score-desc, id-asc. Backed by the
    * native [[CollectTopK]] Catalyst aggregate (no per-row encoder
    * serde; ObjectHashAggregate-eligible); [[TopKAgg]] is the typed
    * `Aggregator` formulation of the same kernel, kept as the
    * differential-testing reference (TopKSpec pins them equal).
    */
  def topK(idCol: Column, scoreCol: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(CollectTopK(
        ColumnBridge.expression(idCol.cast("long")),
        ColumnBridge.expression(scoreCol.cast("double")), k)
      .toAggregateExpression()).as("topk")
  }

  /** The pre-round-5 UDAF plan shape, kept callable for comparison. */
  def topKUdaf(idCol: Column, scoreCol: Column, k: Int): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[Entry]())
      .apply(idCol, scoreCol).as("topk")
}

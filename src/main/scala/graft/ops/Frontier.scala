package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness-interleaved crawl-frontier ordering (X168): assign each
  * pending URL a (round, slot) key such that sorting by
  * (round, slot, url) fetches every host's 1st URL before any host's
  * 2nd, every 2nd before any 3rd, and rotates hosts pseudo-randomly
  * within a round — per-host spacing emerges from a SORT KEY instead
  * of a stateful scheduler. The reference's crawler is politeness-
  * limited per host (the U9 token bucket enforces the per-request
  * delay AT fetch time); this operator removes the reason the limiter
  * would ever block: a host-clustered frontier slams one server while
  * every other worker idles, an interleaved one keeps all hosts warm
  * at the same fetch budget.
  *
  * round = row_number per host under (priority desc, url) — the
  * caller's link score (A6) decides WHICH of a host's URLs goes
  * first, the interleave decides WHEN relative to other hosts.
  * slot = md5(host:round) rotates host order per round (a fixed host
  * order would always hit the same host first in every round — a
  * thundering-herd pattern on round boundaries).
  *
  * Scale shape: one rank window per host over slim rows plus two
  * scalar projections — no global window, no driver state; the final
  * sort is the range-partitioned exchange the writer needs anyway.
  */
object Frontier {

  /** Adds (round, slot) to `links`. Sort by (round, slot, url) for
    * the fetch order; ties on (round, slot) are impossible across
    * hosts in practice (md5 collision) and break on url
    * deterministically.
    */
  def interleaveByHost(links: DataFrame, hostCol: String = "host",
                       urlCol: String = "url",
                       priorityCol: String = null): DataFrame = {
    val order =
      if (priorityCol == null) Seq(col(urlCol).asc)
      else Seq(col(priorityCol).desc, col(urlCol).asc)
    val w = Window.partitionBy(col(hostCol)).orderBy(order: _*)
    links
      .withColumn("round", row_number().over(w).cast("long"))
      .withColumn("slot",
        md5(concat(col(hostCol), lit(":"), col("round").cast("string"))))
  }

  /** The frontier in fetch order (the sorted view of
    * [[interleaveByHost]]).
    */
  def fetchOrder(links: DataFrame, hostCol: String = "host",
                 urlCol: String = "url",
                 priorityCol: String = null): DataFrame =
    interleaveByHost(links, hostCol, urlCol, priorityCol)
      .orderBy(col("round"), col("slot"), col(urlCol))
}

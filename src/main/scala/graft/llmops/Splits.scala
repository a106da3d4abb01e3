package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset-split assignment for training-data pipelines.
  *
  * Splits are a pure function of content (an md5-prefix range check),
  * not of an RNG or row order: the same document lands in the same
  * split on any cluster, at any parallelism, across reruns and
  * incremental appends — the property that makes held-out sets stable
  * as a 100 TB corpus grows. No shuffle: the assignment is a scalar
  * projection, and the md5 is codegen'd.
  */
object Splits {

  /** Hex threshold for a fraction of the 256 two-hex-digit buckets. */
  private def hexAt(frac: Double): String =
    f"${math.min(256, math.round(frac * 256)).toInt}%02x"

  /** 'train' | 'val' | 'test' from the first md5 byte of `text`.
    * Fractions are quantized to 1/256 granularity (md5 bytes are
    * uniform, so realized fractions converge to round(frac·256)/256).
    */
  def assignSplit(text: Column, trainFrac: Double = 0.8,
                  valFrac: Double = 0.1): Column = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      "fractions must be non-negative and sum to at most 1")
    val b = substring(md5(text), 1, 2)
    when(b < lit(hexAt(trainFrac)), "train")
      .when(b < lit(hexAt(trainFrac + valFrac)), "val")
      .otherwise("test")
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.Vocab

/** Corpus-compression comparison of the two tokenizer trainers on the
  * documents table: BPE (merge list, Sennrich 2016) vs unigram-LM
  * (piece probabilities, Kudo 2018 hard-EM) at matched vocabulary
  * budgets. Prints tokens produced per corpus (lower = better
  * compression at equal budget), chars/token, and train time. Backs
  * the SCALING.md "tokenizer families" numbers.
  */
object TokenizerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val budget = if (args.length > 1) args(1).toInt else 256
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text").cache()
    docs.count()
    val base = docs.agg(
        sum(size(split(lower(trim($"text")), "\\s+"))).as("words"),
        sum(length(regexp_replace($"text", "\\s+", ""))).as("chars"))
      .head()
    val (nWords, nChars) = (base.getLong(0), base.getLong(1))
    println(f"corpus: $nWords%d words, $nChars%d non-ws chars")

    // chars in the corpus: both vocabularies carry them for coverage,
    // so the comparable budget is chars + N learned units for each
    val nAlpha = docs.select(explode(split(regexp_replace(
        lower(trim($"text")), "\\s+", ""), "")).as("c"))
      .filter(length($"c") === 1).distinct().count().toInt

    var t0 = System.nanoTime()
    val merges = Vocab.trainBpe(docs, $"text", budget)
    val tBpe = (System.nanoTime() - t0) / 1e9
    val nBpe = docs.agg(sum(size(Vocab.bpe_encode($"text", merges))))
      .head().getLong(0)

    t0 = System.nanoTime()
    val uni = Vocab.trainUnigram(docs, $"text", vocabSize = nAlpha + budget,
      iters = 4, maxPieceLen = 6, seedSize = math.max(2048, 4 * budget))
    val tUni = (System.nanoTime() - t0) / 1e9
    val nUni = docs.agg(sum(size(Vocab.unigram_encode($"text", uni, 6))))
      .head().getLong(0)

    println(f"alphabet: $nAlpha%d chars; learned-unit budget: $budget%d")
    println(f"bpe:     ${nBpe}%d tokens (${nChars.toDouble / nBpe}%.2f chars/tok), train ${tBpe}%.1f s")
    println(f"unigram: ${nUni}%d tokens (${nChars.toDouble / nUni}%.2f chars/tok), train ${tUni}%.1f s")
    spark.stop()
  }
}

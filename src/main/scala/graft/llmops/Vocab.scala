package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary induction for tokenizer training: the BPE merge-selection
  * inner loop (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units") — count adjacent symbol pairs
  * across the corpus and pick the most frequent — expressed as an
  * aggregate-before-explode column pipeline.
  *
  * Scale shape: the corpus collapses to its word-frequency dictionary
  * FIRST (one shuffle carrying (word, count) — |vocab| rows, not
  * |corpus| token rows), and pair explosion runs over that dictionary
  * weighted by frequency. On a 100 TB corpus with a ~10⁷-word
  * vocabulary the explode stage touches 10⁷ rows regardless of corpus
  * size; exploding pairs per document before aggregating would shuffle
  * ~10¹¹ rows for the same answer. Real BPE trainers pre-aggregate to
  * a word dictionary for exactly this reason.
  */
object Vocab {

  /** The word-frequency dictionary of `textCol`: (w, wc), whitespace
    * tokenization per [[TextFuncs.tokens]], single-char words dropped
    * (they contain no pair).
    */
  def wordCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextFuncs.tokens(textCol)).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wc"))

  /** Frequency-weighted adjacent character-pair counts — one BPE
    * merge-selection round over the corpus. Returns (pair, cnt) where
    * cnt is the pair's total occurrence count across all text.
    */
  def bpePairCounts(docs: DataFrame, textCol: Column): DataFrame =
    wordCounts(docs, textCol)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"), col("wc"))
      .groupBy("pair").agg(sum(col("wc")).as("cnt"))

  /** Symbol separator inside the training dictionary's working
    * representation — U+0001 never appears in whitespace-tokenized
    * text, so `regexp_replace` on the quoted pair is unambiguous.
    */
  private val Sep = "\u0001"

  /** Full BPE vocabulary training (Sennrich et al. 2016): repeat
    * [`count weighted adjacent pairs` → `merge the most frequent`]
    * `numMerges` times over the word-frequency dictionary. Returns the
    * merge list in training order — the model [[bpe_encode]] applies.
    *
    * Distribution: the corpus collapses to its (word, count)
    * dictionary ONCE (the [[bpePairCounts]] rationale — |vocab| rows
    * regardless of corpus size); each round then shuffles only
    * (pair, weight) over dictionary rows and the driver receives ONE
    * row (the argmax pair; ties break on the pair string so training
    * is deterministic). The merge itself is a map-side
    * `regexp_replace` on the separator-joined symbol string — global
    * replace is left-to-right non-overlapping, which is exactly BPE's
    * greedy merge semantics for runs like "aaa". Each round
    * localCheckpoints the (tiny) dictionary so plan depth stays O(1)
    * across hundreds of merges.
    */
  def trainBpe(docs: DataFrame, textCol: Column, numMerges: Int)
      : Seq[(String, String)] = {
    var dict = wordCounts(docs, textCol)
      .select(concat_ws(Sep, split(col("w"), "")).as("syms"), col("wc"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val top = dict
        // a fully-merged word has 1 symbol, 0 pairs — and sequence(1, 0)
        // would run DESCENDING into an out-of-bounds element_at
        .filter(size(split(col("syms"), Sep)) >= 2)
        .select(explode(transform(
            sequence(lit(1), size(split(col("syms"), Sep)) - 1),
            i => concat_ws(Sep,
              element_at(split(col("syms"), Sep), i),
              element_at(split(col("syms"), Sep), i + 1)))).as("pair"),
          col("wc"))
        .groupBy("pair").agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .head(1)
      if (top.isEmpty) done = true
      else {
        val Array(l, r) = top(0).getString(0).split(Sep, 2)
        merges += ((l, r))
        val next = dict.withColumn("syms",
            regexp_replace(col("syms"),
              java.util.regex.Pattern.quote(l + Sep + r), l + r))
          .localCheckpoint()
        dict.unpersist()
        dict = next
        round += 1
      }
    }
    dict.unpersist()
    merges.result()
  }

  /** Kernel behind [[BpeEncodeExpr]]: whitespace-tokenize (lowercased,
    * mirroring [[TextFuncs.tokens]]), then encode each word by the
    * trained merge ranks: repeatedly merge the lowest-rank (earliest-
    * trained) adjacent pair present, left-to-right within a rank —
    * the standard BPE inference loop. Unknown pairs never merge, so
    * out-of-vocabulary words fall back toward characters.
    */
  def bpeEncodeText(text: UTF8String,
                    ranks: java.util.HashMap[String, Integer])
      : GenericArrayData = {
    val words = text.toString.toLowerCase.trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    words.foreach { w =>
      var syms = w.map(_.toString).toBuffer
      var merged = true
      while (merged && syms.length > 1) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.get(syms(i) + Sep + syms(i + 1))
          if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) merged = false
        else {
          syms(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
          syms.remove(bestIdx + 1)
        }
      }
      syms.foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** `bpe_encode(text)` → array<string> of subword tokens under a
    * trained merge list. The rank map rides as a codegen reference
    * object, like every other model-carrying kernel.
    */
  case class BpeEncodeExpr(child: Expression,
                           merges: Seq[(String, String)])
      extends UnaryExpression {
    @transient private lazy val ranks = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        m.putIfAbsent(l + Sep + r, i)
      }
      m
    }
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"
    override def nullSafeEval(input: Any): Any =
      Vocab.bpeEncodeText(input.asInstanceOf[UTF8String], ranks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.llmops.Vocab.bpeEncodeText($c, $ref);")
    }
    override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
      copy(child = c)
  }

  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(text), merges))
}

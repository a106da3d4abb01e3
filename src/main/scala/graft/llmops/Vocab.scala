package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}

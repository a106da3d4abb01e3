package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over positional postings (X198) — the
  * retrieval long-tail case bag-of-words BM25 cannot express: "data
  * parallel" and "parallel data" are the same bag but different
  * claims. The classic engine answer (Lucene/ES `match_phrase`) is a
  * positional inverted index; this is the dataflow formulation.
  *
  * Shape: tokenize once with positions (`posexplode` — one scan),
  * keep ONLY postings of the phrase's terms (broadcast semi-join
  * inside the map task, the [[Bm25.corpusTf]] discipline), then one
  * equi-join per phrase gap on the (doc, position+offset) composite
  * key — adjacency as m−1 SLIM joins, never a theta join and never a
  * substring scan over the corpus bytes. At 100 TB the pruned
  * posting rows are the only thing that shuffles, proportional to
  * the phrase terms' document frequency, not corpus size.
  *
  * Occurrences COUNT overlapping matches ("a a a" contains "a a"
  * twice) — the positional-join semantics, stated because
  * replace-based counting (the naive oracle) misses overlaps.
  */
object Phrase {

  /** Documents containing the exact token phrase:
    * (id, n_occurrences), one row per matching doc.
    */
  def phraseMatches(docs: DataFrame, phrase: Seq[String],
                    idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val terms = phrase.map(_.toLowerCase)
    val spark = docs.sparkSession
    import spark.implicits._
    val termSet = terms.distinct.toDF("term")
    val posts = docs.select(col(idCol).as("id"),
        posexplode(TextFuncs.tokens(col(textCol))).as(Seq("pos", "term")))
      .join(broadcast(termSet), Seq("term"))
      .localCheckpoint(false) // m slices of one pruned scan
    val starts = terms.zipWithIndex.map { case (t, i) =>
      posts.filter(col("term") === t)
        .select(col("id"), (col("pos") - i).as("start"))
    }.reduce { (a, b) => a.join(b, Seq("id", "start")) }
    starts.groupBy(col("id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Top-k docs by phrase frequency (ties by id), with the doc's
    * token count riding along for length context:
    * (id, n_occurrences, n_tokens).
    */
  def phraseTopK(docs: DataFrame, phrase: Seq[String], k: Int,
                 idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(k >= 1, "k must be >= 1")
    val lens = docs.select(col(idCol).as("id"),
      TextFuncs.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    phraseMatches(docs, phrase, idCol, textCol)
      .join(lens, Seq("id"))
      .orderBy(col("n_occurrences").desc, col("id"))
      .limit(k)
      .withColumnRenamed("id", idCol)
  }
}

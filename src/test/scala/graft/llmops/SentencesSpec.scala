package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SentencesSpec extends SparkTestBase {
  import spark.implicits._

  private def split(s: String): Seq[String] =
    SentenceKernels.split(s).toSeq

  test("basic boundaries: . ! ? before an uppercase or digit start") {
    assert(split("One here. Two there! Three now? 4 begins.") ==
      Seq("One here.", "Two there!", "Three now?", "4 begins."))
  }

  test("abbreviations and initials do not end sentences") {
    assert(split("Dr. Smith met Mr. J. Jones of Acme Inc. today. Then left.") ==
      Seq("Dr. Smith met Mr. J. Jones of Acme Inc. today.", "Then left."))
    assert(split("The U.S. Federal filing arrived. Done.") ==
      Seq("The U.S. Federal filing arrived.", "Done."))
    assert(split("See e.g. the appendix. Next point.") ==
      Seq("See e.g. the appendix.", "Next point."))
  }

  test("lowercase follower keeps the sentence together") {
    assert(split("It rose 3.5 percent. fine print follows here") ==
      Seq("It rose 3.5 percent. fine print follows here"))
    assert(split("version 2.0 shipped today") ==
      Seq("version 2.0 shipped today"))
  }

  test("closing quotes and brackets ride with their sentence") {
    assert(split("He said \"Stop.\" Then he left.") ==
      Seq("He said \"Stop.\"", "Then he left."))
    assert(split("(It worked.) Next day came.") ==
      Seq("(It worked.)", "Next day came."))
  }

  test("terminator runs and end-of-text") {
    assert(split("Really?! Yes. The end") ==
      Seq("Really?!", "Yes.", "The end"))
    assert(split("Trailing period.") == Seq("Trailing period."))
    assert(split("") == Seq())
    assert(SentenceKernels.split(null) == null)
  }

  test("expression: DataFrame, SQL registration, explode composition") {
    val df = Seq("Alpha one. Beta two! Gamma?").toDF("t")
    val arr = df.select(Sentences.sentences($"t")).as[Seq[String]].head()
    assert(arr == Seq("Alpha one.", "Beta two!", "Gamma?"))
    df.createOrReplaceTempView("sent_t")
    assert(spark.sql("SELECT size(split_sentences(t)) FROM sent_t")
      .head.getInt(0) == 3)
    // null propagation
    val nulls = Seq(Option.empty[String]).toDF("t")
      .select(Sentences.sentences($"t"))
    assert(nulls.head.isNullAt(0))
    // composes with explode for sentence-level stages
    val n = df.select(explode(Sentences.sentences($"t"))).count()
    assert(n == 3)
  }
}

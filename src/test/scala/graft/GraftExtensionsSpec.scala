package graft

class GraftExtensionsSpec extends SparkTestBase {

  test("custom expressions are usable from SQL via extensions") {
    val got = spark.sql(
      """SELECT resolve_url('a.pdf', 'https://h.com/x/') AS u,
                simhash64('hello world') AS fp,
                size(minhash_signature('hello world hello')) AS n,
                clean_html('<p>x</p><script>y</script>') AS c""").head()
    assert(got.getAs[String]("u") == "https://h.com/x/a.pdf")
    assert(got.getAs[Int]("n") == 128)
    assert(got.getAs[String]("c") == "<p>x</p>")
    assert(spark.sql(
      """SELECT extract_links('<a href="/x.pdf">X</a>')""").count() == 1)
  }

  test("collect_top_k aggregate is usable from SQL") {
    // INT id + INT score: ImplicitCastInputTypes must widen both at
    // analysis (a raw registration would ClassCastException at runtime)
    spark.range(0, 100)
      .selectExpr("id % 4 AS g", "CAST(id AS INT) AS id",
        "CAST(id % 13 AS INT) AS s")
      .createOrReplaceTempView("topk_in")
    val rows = spark.sql(
      """SELECT g, t.col._1 AS id, t.col._2 AS s
         FROM (SELECT g, collect_top_k(id, s, 3) AS tk
               FROM topk_in GROUP BY g),
         LATERAL explode(tk) AS t""").collect()
    assert(rows.length == 12) // 4 groups x 3
    // every kept score is a group maximum-tier score (12.0 at id%13==12)
    assert(rows.forall(_.getAs[Double]("s") >= 11.0))
  }

  test("cosine_sim is usable from SQL") {
    val r = spark.sql(
      """SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
                           array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS same,
                cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
                           array(CAST(0 AS FLOAT), CAST(2 AS FLOAT))) AS orth,
                cosine_sim(array(CAST(0 AS FLOAT), CAST(0 AS FLOAT)),
                           array(CAST(1 AS FLOAT), CAST(1 AS FLOAT))) AS zero,
                cosine_sim(array(CAST(1 AS FLOAT)),
                           array(CAST(1 AS FLOAT), CAST(1 AS FLOAT))) AS bad
      """).head()
    assert(math.abs(r.getAs[Double]("same") - 1.0) < 1e-12)
    assert(r.getAs[Double]("orth") == 0.0)
    assert(r.getAs[Double]("zero") == 0.0)   // zero-vector guard
    assert(r.isNullAt(r.fieldIndex("bad")))  // length mismatch -> null
  }

  test("dot_product is usable from SQL") {
    val r = spark.sql(
      """SELECT dot_product(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
                            array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d,
                dot_product(array(CAST(1 AS FLOAT)),
                            array(CAST(1 AS FLOAT), CAST(1 AS FLOAT))) AS bad
      """).head()
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.isNullAt(r.fieldIndex("bad")))
  }

  test("round-2 expressions registered: simhash128 and winnow_fingerprints") {
    val r = spark.sql(
      """SELECT size(simhash128('hello world')) AS halves,
                element_at(simhash128('hello world'), 1) AS h1,
                simhash64('hello world') AS h64,
                size(winnow_fingerprints('the quick brown fox jumps over')) AS nfp,
                size(winnow_fingerprints('the quick brown fox jumps over', 4, 6)) AS nfp2
      """).head()
    assert(r.getAs[Int]("halves") == 2)
    // first half is seeded with 0 — identical to the 64-bit fingerprint
    assert(r.getAs[Long]("h1") == r.getAs[Long]("h64"))
    assert(r.getAs[Int]("nfp") > 0 && r.getAs[Int]("nfp2") > 0)
  }
}

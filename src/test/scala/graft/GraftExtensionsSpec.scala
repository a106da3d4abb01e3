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

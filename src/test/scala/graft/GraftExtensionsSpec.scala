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
}

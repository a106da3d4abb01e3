package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlFuncsSpec extends SparkTestBase {

  test("resolve kernel: absolute, root-relative, relative, scheme-relative") {
    val base = "https://ir.example.com/filings/index.html"
    assert(UrlKernels.resolve("https://x.com/a.pdf", base) == "https://x.com/a.pdf")
    assert(UrlKernels.resolve("/abs/a.pdf", base) == "https://ir.example.com/abs/a.pdf")
    assert(UrlKernels.resolve("rel/a.pdf", base) == "https://ir.example.com/filings/rel/a.pdf")
    assert(UrlKernels.resolve("//cdn.x.com/a.pdf", base) == "https://cdn.x.com/a.pdf")
    assert(UrlKernels.resolve("", base) == base)
    assert(UrlKernels.resolve(null, base) == null)
  }

  test("resolve kernel matches java.net.URI on clean inputs") {
    val base = "https://host.example.com/a/b/c.html"
    for (href <- Seq("d.pdf", "../up.pdf", "/root.pdf", "?q=1", "#frag",
                     "sub/dir/x.html", "//other.com/y"))
      assert(UrlKernels.resolve(href, base) ==
        new java.net.URI(base).resolve(href).toString, s"href=$href")
  }

  test("resolve kernel is lenient where URI throws (spaces)") {
    val got = UrlKernels.resolve("my file.pdf", "https://h.com/a/")
    assert(got == "https://h.com/a/my file.pdf")
  }

  test("host extraction") {
    assert(UrlKernels.host("https://User@Sub.Host.COM:8080/p?q#f") == "sub.host.com")
    assert(UrlKernels.host("not a url") == null)
  }

  test("ResolveUrl expression works in a DataFrame with codegen") {
    import spark.implicits._
    val df = Seq(("a.pdf", "https://h.com/x/"), ("/r.pdf", "https://h.com/x/"))
      .toDF("href", "base")
    val out = df.select(UrlFuncs.resolve_url($"href", $"base").as("u"))
      .as[String].collect().toSeq
    assert(out == Seq("https://h.com/x/a.pdf", "https://h.com/r.pdf"))
  }

  test("canonical_url: the visited-set key collapses page-identity noise") {
    val cases = Seq(
      // scheme/host case, default port, fragment
      ("HTTP://Ex.COM:80/a?x=1#frag", "http://ex.com/a?x=1"),
      ("https://ex.com:443/a", "https://ex.com/a"),
      ("https://ex.com:8443/a", "https://ex.com:8443/a"), // non-default kept
      // path: duplicate slashes, dot segments, empty path
      ("https://ex.com/a//b/../c", "https://ex.com/a/c"),
      ("https://ex.com", "https://ex.com/"),
      // query: tracking stripped, rest sorted, empty query dropped
      ("https://ex.com/p?utm_source=x&b=2&a=1", "https://ex.com/p?a=1&b=2"),
      ("https://ex.com/p?gclid=99&fbclid=z", "https://ex.com/p"),
      ("https://ex.com/p?b=2&a=1&a=0", "https://ex.com/p?a=0&a=1&b=2"),
      // raw components: escaped DELIMITERS stay distinct from literal
      // ones, hex case-normalized to uppercase; escapes of UNRESERVED
      // chars decode (RFC 3986 6.2.2.2), so encoded tracking params
      // strip and spurious encodings collapse
      ("https://ex.com/p?a=1%262", "https://ex.com/p?a=1%262"),
      ("https://ex.com/p?a=1&2", "https://ex.com/p?2&a=1"),
      ("https://ex.com/a%2fb", "https://ex.com/a%2Fb"),
      ("https://ex.com/a%2F..%2Fb", "https://ex.com/a%2F..%2Fb"),
      ("https://ex.com/x/%2E%2E/y", "https://ex.com/y"),
      ("https://ex.com/p?utm%5Fsource=x&a=%32", "https://ex.com/p?a=2"),
      // unparseable stays itself
      ("not a url at all", "not a url at all"))
    cases.foreach { case (in, want) =>
      assert(UrlKernels.canonicalize(in) == want, s"in=$in")
    }
    // idempotent: canonical of canonical is canonical
    cases.foreach { case (in, want) =>
      assert(UrlKernels.canonicalize(want) == want, s"want=$want")
    }
    // the expression path (codegen) agrees with the kernel
    import spark.implicits._
    val got = cases.map(_._1).toDF("u")
      .select(UrlFuncs.canonical_url($"u")).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("same_host built-in pipeline") {
    import spark.implicits._
    val df = Seq(("https://a.com/x", "https://A.com/y", true),
                 ("https://a.com/x", "https://b.com/y", false)).toDF("a", "b", "want")
    val got = df.select((UrlFuncs.same_host($"a", $"b") === $"want").as("ok"))
      .as[Boolean].collect()
    assert(got.forall(identity))
  }
}

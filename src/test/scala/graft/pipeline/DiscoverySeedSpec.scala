package graft.pipeline

import java.nio.file.Files

import graft.SparkTestBase
import graft.services.MapPageFetcher
import org.apache.spark.sql.functions._

class DiscoverySeedSpec extends SparkTestBase {
  import spark.implicits._

  val irHtml =
    """<html><head><title>Acme Investor Relations</title></head><body>
      |Quarterly results, annual report archive, SEC filings and
      |earnings information for shareholders. Dividend history.
      |</body></html>""".stripMargin
  val bareHtml = "<html><head><title>Acme</title></head><body>Products</body></html>"

  test("discovery cascade: subdomain beats path; misses are Not Found") {
    val fetcher = MapPageFetcher(Map(
      // acme: both subdomain and path exist → subdomain (priority) wins
      "https://investors.acme.com" -> irHtml,
      "https://acme.com/investors" -> irHtml,
      // beta: only path probe hits
      "https://beta.com/investor-relations" -> irHtml,
      // gamma: page exists but is not investor-ish → rejected by score
      "https://investors.gamma.com" -> bareHtml))
    val companies = Seq(
      ("ACME", "Acme Corp", "https://www.acme.com"),
      ("BETA", "Beta Inc", "https://beta.com"),
      ("GAMA", "Gamma Plc", "https://gamma.com"))
      .toDF("ticker", "company", "website")
    val got = Discovery.discover(spark, companies, fetcher)
      .select($"ticker", $"ir_url", $"status")
      .as[(String, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got("ACME") == (("https://investors.acme.com", "Found")))
    assert(got("BETA") == (("https://beta.com/investor-relations", "Found")))
    assert(got("GAMA") == (("", "Not Found")))
  }

  test("sitemap-seeded discovery: robots -> sitemap -> IR locs scored; " +
      "fallback /sitemap.xml; non-IR locs never fetched") {
    val sm =
      """<urlset>
        | <url><loc>https://acme.com/products</loc></url>
        | <url><loc>https://acme.com/investor-relations</loc></url>
        | <url><loc>https://acme.com/careers</loc></url>
        |</urlset>""".stripMargin
    val fetcher = MapPageFetcher(Map(
      // acme declares its sitemap in robots.txt (hostOf strips www.)
      "https://acme.com/robots.txt" ->
        "User-agent: *\nAllow: /\nSitemap: https://acme.com/maps/main.xml\n",
      "https://acme.com/maps/main.xml" -> sm,
      "https://acme.com/investor-relations" -> irHtml,
      // if a non-IR loc were fetched, this would score and win by
      // priority — its absence from the fetcher map also means a fetch
      // attempt returns None rather than failing
      // beta has no robots.txt; the conventional fallback serves it
      "https://beta.com/sitemap.xml" ->
        """<urlset><url><loc>https://beta.com/shareholder-info</loc></url>
          |<url><loc>https://beta.com/about</loc></url></urlset>""".stripMargin,
      "https://beta.com/shareholder-info" -> irHtml,
      // gamma's sitemap lists an IR-looking loc whose PAGE is not
      // investor-ish -> rejected by the indicator score
      "https://gamma.com/sitemap.xml" ->
        "<urlset><url><loc>https://gamma.com/investors</loc></url></urlset>",
      "https://gamma.com/investors" -> bareHtml))
    val companies = Seq(
      ("ACME", "Acme Corp", "https://www.acme.com"),
      ("BETA", "Beta Inc", "https://beta.com"),
      ("GAMA", "Gamma Plc", "https://gamma.com"))
      .toDF("ticker", "company", "website")
    val got = Discovery.discoverFromSitemaps(spark, companies, fetcher)
      .select($"ticker", $"ir_url", $"status")
      .as[(String, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got("ACME") == (("https://acme.com/investor-relations", "Found")))
    assert(got("BETA") == (("https://beta.com/shareholder-info", "Found")))
    assert(got("GAMA") == (("", "Not Found")))
  }

  test("sitemap discovery respects the robots rules it already holds: " +
      "disallowed IR candidates are never fetched") {
    val fetcher = MapPageFetcher(Map(
      "https://zeta.com/robots.txt" ->
        ("User-agent: *\nDisallow: /private-investor/\n" +
          "Sitemap: https://zeta.com/maps/m.xml\n"),
      "https://zeta.com/maps/m.xml" ->
        ("<urlset><url><loc>https://zeta.com/private-investor/portal</loc>" +
          "</url><url><loc>https://zeta.com/investor-relations</loc>" +
          "</url></urlset>"),
      // both pages exist and would score; robots must prune the first
      "https://zeta.com/private-investor/portal" -> irHtml,
      "https://zeta.com/investor-relations" -> irHtml))
    val companies = Seq(("ZETA", "Zeta Plc", "https://zeta.com"))
      .toDF("ticker", "company", "website")
    val got = Discovery.discoverFromSitemaps(spark, companies, fetcher)
      .select($"ir_url").as[String].head()
    assert(got == "https://zeta.com/investor-relations")
  }

  test("sitemap-index discovery: child sitemaps are fetched as " +
      "sitemaps, not scored as pages") {
    val fetcher = MapPageFetcher(Map(
      // the standard large-site layout: /sitemap.xml is an INDEX
      "https://delta.com/sitemap.xml" ->
        """<sitemapindex>
          | <sitemap><loc>https://delta.com/maps/a.xml</loc></sitemap>
          | <sitemap><loc>https://delta.com/maps/b.xml</loc></sitemap>
          |</sitemapindex>""".stripMargin,
      "https://delta.com/maps/a.xml" ->
        "<urlset><url><loc>https://delta.com/products</loc></url></urlset>",
      "https://delta.com/maps/b.xml" ->
        ("<urlset><url><loc>https://delta.com/investor-relations</loc>" +
          "</url></urlset>"),
      "https://delta.com/investor-relations" -> irHtml))
    val companies = Seq(("DLTA", "Delta Co", "https://delta.com"))
      .toDF("ticker", "company", "website")
    val got = Discovery.discoverFromSitemaps(spark, companies, fetcher)
      .select($"ticker", $"ir_url", $"status")
      .as[(String, String, String)].head()
    assert(got == (("DLTA", "https://delta.com/investor-relations",
      "Found")))
  }

  test("sitemap-index discovery walks nested indexes to maxDepth " +
      "under a fetch budget") {
    // real hosts nest indexes: /sitemap.xml → index → child index →
    // urlset. Default maxDepth=2 reaches the grandchild urlset.
    val fetcher = MapPageFetcher(Map(
      "https://eps.com/sitemap.xml" ->
        ("<sitemapindex><sitemap><loc>https://eps.com/maps/l1.xml</loc>" +
          "</sitemap></sitemapindex>"),
      "https://eps.com/maps/l1.xml" ->
        ("<sitemapindex><sitemap><loc>https://eps.com/maps/l2.xml</loc>" +
          "</sitemap></sitemapindex>"),
      "https://eps.com/maps/l2.xml" ->
        ("<urlset><url><loc>https://eps.com/investor-relations</loc>" +
          "</url></urlset>"),
      "https://eps.com/investor-relations" -> irHtml))
    val companies = Seq(("EPSN", "Eps Co", "https://eps.com"))
      .toDF("ticker", "company", "website")
    val deep = Discovery.discoverFromSitemaps(spark, companies, fetcher)
      .select($"ir_url", $"status").as[(String, String)].head()
    assert(deep == (("https://eps.com/investor-relations", "Found")))
    // maxDepth=1 stops at the child INDEX — the urlset is never read
    val shallow = Discovery.discoverFromSitemaps(spark, companies, fetcher,
        maxDepth = 1)
      .select($"status").as[String].head()
    assert(shallow == "Not Found")
    // a 1-fetch budget covers only the root — same structural bound
    val broke = Discovery.discoverFromSitemaps(spark, companies, fetcher,
        sitemapFetchBudget = 1)
      .select($"status").as[String].head()
    assert(broke == "Not Found")
  }

  test("robots gates the fallback sitemap and child sitemaps, " +
      "not just page candidates") {
    val fetcher = MapPageFetcher(Map(
      // theta disallows /sitemap.xml; the fallback WOULD serve an IR
      // loc whose page scores — robots must keep it unfetched
      "https://theta.com/robots.txt" ->
        "User-agent: *\nDisallow: /sitemap.xml\n",
      "https://theta.com/sitemap.xml" ->
        ("<urlset><url><loc>https://theta.com/investor-relations</loc>" +
          "</url></urlset>"),
      "https://theta.com/investor-relations" -> irHtml,
      // iota's declared sitemap is an index whose CHILD is disallowed
      "https://iota.com/robots.txt" ->
        ("User-agent: *\nDisallow: /private/\n" +
          "Sitemap: https://iota.com/root.xml\n"),
      "https://iota.com/root.xml" ->
        ("<sitemapindex><sitemap><loc>https://iota.com/private/m.xml" +
          "</loc></sitemap></sitemapindex>"),
      "https://iota.com/private/m.xml" ->
        ("<urlset><url><loc>https://iota.com/investor-relations</loc>" +
          "</url></urlset>"),
      "https://iota.com/investor-relations" -> irHtml))
    val companies = Seq(
      ("THTA", "Theta Co", "https://theta.com"),
      ("IOTA", "Iota Co", "https://iota.com"))
      .toDF("ticker", "company", "website")
    val got = Discovery.discoverFromSitemaps(spark, companies, fetcher)
      .select($"ticker", $"status").as[(String, String)].collect().toMap
    assert(got("THTA") == "Not Found")
    assert(got("IOTA") == "Not Found")
  }

  test("robots rules are host-scoped: a CDN-hosted child sitemap is " +
      "not gated by the seed host's paths") {
    val fetcher = MapPageFetcher(Map(
      // kappa disallows /sitemaps/ ON KAPPA.COM; the child sitemap
      // lives on a CDN under the same PATH — RFC 9309 rules are per
      // host, so the seed host's rule must not drop it
      "https://kappa.com/robots.txt" ->
        ("User-agent: *\nDisallow: /sitemaps/\n" +
          "Sitemap: https://kappa.com/root.xml\n"),
      "https://kappa.com/root.xml" ->
        ("<sitemapindex><sitemap><loc>https://cdn.kappacdn.net/sitemaps/" +
          "m.xml</loc></sitemap></sitemapindex>"),
      "https://cdn.kappacdn.net/sitemaps/m.xml" ->
        ("<urlset><url><loc>https://kappa.com/investor-relations</loc>" +
          "</url></urlset>"),
      "https://kappa.com/investor-relations" -> irHtml))
    val companies = Seq(("KAPA", "Kappa Co", "https://kappa.com"))
      .toDF("ticker", "company", "website")
    val got = Discovery.discoverFromSitemaps(spark, companies, fetcher)
      .select($"ir_url", $"status").as[(String, String)].head()
    assert(got == (("https://kappa.com/investor-relations", "Found")))
  }

  test("P15: off-domain redirect accepted only via investor-ish host") {
    import graft.services.MapRedirectFetcher
    val fetcher = MapRedirectFetcher(Map(
      // acme's probe redirects off-domain to a third-party investor
      // portal → investor marker exempts it (find_IR_pgs_v1.py:94)
      "https://investors.acme.com" ->
        (("https://investor.thirdpartyhub.com/acme", irHtml)),
      // beta's probe redirects to an unrelated host with no marker
      // ('example-media.com' contains neither 'beta.com' nor any of
      // investor/ir/pginvestor) → rejected
      "https://investors.beta.com" ->
        (("https://cdn.example-media.com/landing", irHtml)),
      // gamma's probe redirects to a login page → skip-pattern on the
      // FINAL url rejects it (find_IR_pgs_v1.py:80)
      "https://investors.gamma.com" ->
        (("https://investors.gamma.com/login", irHtml))))
    val companies = Seq(
      ("ACME", "Acme Corp", "https://www.acme.com"),
      ("BETA", "Beta Inc", "https://beta.com"),
      ("GAMA", "Gamma Plc", "https://gamma.com"))
      .toDF("ticker", "company", "website")
    val got = Discovery.discover(spark, companies, fetcher)
      .select($"ticker", $"ir_url", $"status")
      .as[(String, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got("ACME") ==
      (("https://investor.thirdpartyhub.com/acme", "Found")))
    assert(got("BETA") == (("", "Not Found")))
    assert(got("GAMA") == (("", "Not Found")))
  }

  test("P15 rule itself: containment + marker semantics match the reference") {
    assert(Discovery.redirectHostOk("investors.acme.com", "acme.com"))
    assert(Discovery.redirectHostOk("investor.other.com", "acme.com"))
    assert(Discovery.redirectHostOk("pginvestor.example.com", "acme.com"))
    assert(!Discovery.redirectHostOk("cdn.example-media.com", "acme.com"))
    // reference quirk: 'ir' matches anywhere in the host
    assert(Discovery.redirectHostOk("thirdparty.com", "acme.com"))
    // empty own host skips the check (reference `if company_name:`)
    assert(Discovery.redirectHostOk("anything.com", ""))
  }

  val wikitable =
    """<table class="wikitable">
      |<tr><th>Company</th><th>Symbol</th><th>Industry</th></tr>
      |<tr><td>3M</td><td>MMM</td><td>Conglomerate</td></tr>
      |<tr><td>American Express</td><td>AXP</td><td>Financial services</td></tr>
      |<tr><td></td><td></td><td></td></tr>
      |</table>""".stripMargin

  test("seed builder: wikitable → keyword-mapped columns → J2 join → CSV") {
    val pages = Seq(Tuple1(s"<html><body>$wikitable</body></html>")).toDF("html")
    val companies = Seed.companiesFromWikitable(spark, pages)
    val got = companies.as[(String, String, Option[String])].collect().toSet
    assert(got == Set(
      ("MMM", "3M", Some("Conglomerate")),
      ("AXP", "American Express", Some("Financial services"))))

    val dim = Seq(("MMM", "https://investors.3m.com")).toDF("ticker", "ir_url")
    val joined = Seed.withIrUrls(companies, dim)
    assert(joined.filter($"ticker" === "MMM")
      .select($"ir_url").as[String].head() == "https://investors.3m.com")
    assert(joined.filter($"ticker" === "AXP")
      .select($"ir_url").isEmpty == false)

    val out = Files.createTempDirectory("graft-csv").resolve("seed").toString
    Seed.writeCsv(joined, out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("ticker", "company", "sector", "ir_url"))

    // S13: same table as a workbook (reference get30DowTickers.py:243)
    val xlsx = Files.createTempDirectory("graft-xlsx").resolve("seed.xlsx").toString
    Seed.writeExcel(joined, xlsx)
    val zip = new java.util.zip.ZipFile(xlsx)
    try assert(zip.getEntry("xl/worksheets/sheet1.xml") != null)
    finally zip.close()
  }
}

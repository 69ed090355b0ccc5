package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** URL curation: canonicalization contract cases (case, port, fragment,
  * tracking params, empty query collapse, path-less and query-less
  * shapes), registered domains, per-doc link stats, per-domain rollups,
  * and blocklist filtering semantics. */
class UrlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canonOf(url: String): String =
    Seq(url).toDF("u").select(Urls.canonicalize(col("u"))).head().getString(0)

  private def domainOf(url: String): String =
    Seq(url).toDF("u").select(Urls.registeredDomain(col("u"))).head().getString(0)

  test("canonicalize: hand-computed contract cases") {
    assert(canonOf("HTTPS://Www.Example.COM:443/Path/A?utm_source=x&id=7&utm_b=y#frag")
      == "https://www.example.com/Path/A?id=7")
    assert(canonOf("http://example.org") == "http://example.org")
    assert(canonOf("http://example.org/") == "http://example.org/")
    assert(canonOf("http://Example.org?a=1") == "http://example.org?a=1")
    assert(canonOf("http://example.org/p?utm_only=1") == "http://example.org/p",
      "a query left empty by stripping must drop its '?'")
    assert(canonOf("http://example.org:8080/p") == "http://example.org/p")
    assert(canonOf("https://a.b.c.example.net/Deep/Path")
      == "https://a.b.c.example.net/Deep/Path", "path case preserved")
  }

  test("registered domain: default rule (unknown TLD = last two labels); " +
    "single-label host unchanged") {
    assert(domainOf("https://news.site3.Example.COM:443/x") == "example.com")
    assert(domainOf("http://example.org/a") == "example.org")
    assert(domainOf("http://localhost/x") == "localhost")
  }

  test("registered domain is PSL-backed eTLD+1: ccTLD registries, " +
    "private registries, wildcards and exceptions resolve correctly") {
    // 2-label public suffixes: the naive last-2 rule would return the
    // registry itself ("co.uk") and merge every UK site into one domain
    assert(domainOf("http://www.bbc.co.uk/news") == "bbc.co.uk")
    assert(domainOf("https://shop.Example.COM.AU:8080/x?a=1") == "example.com.au")
    assert(domainOf("http://a.deep.sub.gov.br/x") == "sub.gov.br")
    // host IS the registry: no registrant label to add
    assert(domainOf("http://co.uk/") == "co.uk")
    // private registries are registrant boundaries too
    assert(domainOf("http://user.github.io/repo") == "user.github.io")
    assert(domainOf("http://a.b.user.github.io/x") == "user.github.io")
    // 3-label suffix
    assert(domainOf("http://bucket.s3.amazonaws.com/key") == "bucket.s3.amazonaws.com")
    // wildcard TLD (*.ck): any second-level label is itself a suffix
    assert(domainOf("http://shop.foo.ck/x") == "shop.foo.ck")
    // exception rule (!www.ck) overrides the wildcard
    assert(domainOf("http://www.ck/x") == "www.ck")
    // deep subdomains of a default-rule TLD still collapse to eTLD+1
    assert(domainOf("http://a.b.c.d.example.com/x") == "example.com")
  }

  test("linkStats: counts, distinct canon collapse, link density") {
    val d = Seq(
      (1L, "plain text no links at all"),
      // two raw urls that CANONICALIZE to the same thing + one other domain
      (2L, "a http://X.Example.com/p?utm_s=1 b http://x.example.com/p c " +
        "http://other.org/q"),
      (3L, "http://a.com/1 http://a.com/2 http://a.com/3 http://a.com/4")
    ).toDF("doc_id", "text")
    val out = Urls.linkStats(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out(1L) == ((0L, 0L, 0L, 0L)))
    assert(out(2L)._1 == 3L, "three raw urls")
    assert(out(2L)._2 == 2L, "utm variant collapses with its clean twin")
    assert(out(2L)._3 == 2L, "two registered domains")
    assert(out(3L) == ((4L, 4L, 1L, 4L * 1000 / 4)),
      "4 urls over 4 tokens -> density 1000")
  }

  test("domainStats: per-domain url and doc counts") {
    val d = Seq(
      (1L, "x http://a.example.com/1 y http://b.example.com/2"),
      (2L, "z http://c.example.com/3 w http://other.org/4")
    ).toDF("doc_id", "text")
    val out = Urls.domainStats(d, "doc_id", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("example.com") == ((3L, 2L)))
    assert(out("other.org") == ((1L, 1L)))
  }

  test("dropBlockedDomains: any blocked link drops the doc; clean and " +
    "link-free docs survive; matching is by HOST SUFFIX chain, " +
    "case-insensitive") {
    val d = Seq(
      (1L, "no links here"),
      (2L, "ok http://fine.example.com/x"),
      (3L, "bad http://Sub.SPAM.net/x plus http://fine.example.com/y"),
      (4L, "http://spam.net/direct")
    ).toDF("doc_id", "text")
    val kept = Urls.dropBlockedDomains(d, "doc_id", "text", Seq("Spam.NET"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
    intercept[IllegalArgumentException] {
      Urls.dropBlockedDomains(d, "doc_id", "text", Seq.empty)
    }
  }

  test("dropBlockedDomains: a platform-level entry on a PSL private-" +
    "registry suffix (github.io) blocks every subdomain — the PSL " +
    "upgrade must not un-block platform entries (registeredDomain " +
    "returns user.github.io, the blocklist still matches the suffix)") {
    val d = Seq(
      (1L, "see http://alice.github.io/post"),
      (2L, "see http://deep.sub.blogspot.com/x"),
      (3L, "fine http://github.com/org/repo"), // github.COM is not blocked
      (4L, "fine http://iogames.example.org/x") // 'io' label only as prefix
    ).toDF("doc_id", "text")
    val kept = Urls.dropBlockedDomains(d, "doc_id", "text",
      Seq("github.io", "blogspot.com"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L), s"suffix-chain blocklist broke: $kept")
  }

  test("NULL text: blocklist keeps the row (nothing to block), stats read " +
    "all-zero — three-valued logic never silently drops or nulls") {
    val d = Seq((1L, Some("x http://spam.net/a")), (2L, None))
      .toDF("doc_id", "text")
    val kept = Urls.dropBlockedDomains(d, "doc_id", "text", Seq("spam.net"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L), s"null-text row must survive the blocklist: $kept")
    val stats = Urls.linkStats(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    assert(stats(2L) == ((0L, 0L)), "null text must read zero links/density")
  }

  test("perDomainCap: bounded-aggregator selection equals the window " +
    "reference, no-URL docs exempt, kept set invariant to partitioning") {
    // 12 docs on example.com, 2 on mirror.co.uk (PSL branch), 3 no-URL
    val docs = ((1L to 12L).map(i =>
      (i, s"see http://example.com/p$i and more")) ++
      Seq((20L, "a http://www.mirror.co.uk/x"),
        (21L, "b http://sub.mirror.co.uk/y"),
        (30L, "plain text"), (31L, "no links here"), (32L, "")))
      .toDF("doc_id", "text")
    val got = Urls.perDomainCap(docs, "doc_id", "text", cap = 3)
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    // window reference: rank by (polyhash(id), id) within domain
    val ref = docs.select(col("doc_id"),
        when(size(regexp_extract_all(col("text"), lit(Urls.UrlRe), lit(0))) > 0,
          Urls.registeredDomain(element_at(
            regexp_extract_all(col("text"), lit(Urls.UrlRe), lit(0)), 1)))
          .as("domain"),
        graft.functions.TextAnalysis.strHash(col("doc_id").cast("string"))
          .as("hv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain").orderBy(col("hv"), col("doc_id"))
    val refKept = ref.filter(col("domain").isNotNull)
      .withColumn("pick", row_number().over(w).cast("long"))
      .filter(col("pick") <= 3)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(3))).toSet
    val refExempt = ref.filter(col("domain").isNull)
      .collect().map(r => (r.getLong(0), Option.empty[String], -1L)).toSet
    assert(got == refKept ++ refExempt,
      s"aggregator selection diverged from the window reference:\n$got")
    // cap enforced; PSL key separates registrants under co.uk
    val byDom = got.toSeq.flatMap(t => t._2.map(_ -> t._1)).groupBy(_._1)
    assert(byDom("example.com").size == 3)
    assert(byDom("mirror.co.uk").size == 2, // both fit under the cap
      s"www./sub. mirror.co.uk must share one eTLD+1 key: $byDom")
    assert(got.count(_._2.isEmpty) == 3, "no-URL docs must all survive")
    // content-addressed: the kept set ignores partitioning/arrival order
    val shuffled = Urls.perDomainCap(
      docs.orderBy(col("doc_id").desc).repartition(7), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(shuffled == got, "kept set depends on partitioning")
  }

  test("plans stay in-scan: linkStats and dropBlockedDomains take zero " +
    "shuffles; domainStats shuffles only (id, domain) pairs") {
    val d = Seq((1L, "x http://a.example.com/1")).toDF("doc_id", "text")
    val p1 = Urls.linkStats(d, "doc_id", "text").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(graft.PlanChecks.shuffleExchanges(p1) == 0, p1)
    val p2 = Urls.dropBlockedDomains(d, "doc_id", "text", Seq("spam.net"))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(graft.PlanChecks.shuffleExchanges(p2) == 0, p2)
    val p3 = Urls.domainStats(d, "doc_id", "text").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeLines = p3.linesIterator
      .filter(_.trim.matches("""\(\d+\) Exchange.*""")).mkString("\n")
    assert(!exchangeLines.contains("text"),
      s"document text crosses the domain-rollup exchange:\n$exchangeLines")
  }
}

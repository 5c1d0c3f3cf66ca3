package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlFns

/** Wave 43: URL canonicalization + registered-domain dedup. */
class Wave43Spec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(UrlFns.canonicalizeUrl($"u")).as[String].head()

  test("canonicalizeUrl: case, default port, fragment, tracking, sort") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/Docs/A?utm_campaign=x&b=2&a=1#frag")
      == "https://www.example.com/Docs/A?a=1&b=2")
    // path case PRESERVED, host case folded
    assert(canon("https://HOST.example.com/CaseSensitive")
      == "https://host.example.com/CaseSensitive")
    // http's default port is 80; 8080 is NOT default and survives
    assert(canon("http://h.example.com:80/x") == "http://h.example.com/x")
    assert(canon("http://h.example.com:8080/x")
      == "http://h.example.com:8080/x")
    // :443 is only default for https
    assert(canon("http://h.example.com:443/x")
      == "http://h.example.com:443/x")
  }

  test("canonicalizeUrl: empty path and emptied query") {
    assert(canon("https://h.example.com") == "https://h.example.com/")
    assert(canon("https://h.example.com?utm_source=x")
      == "https://h.example.com/")
    assert(canon("https://h.example.com/p?fbclid=1&gclid=2&utm_a=3")
      == "https://h.example.com/p")
    // a non-tracking param whose NAME merely contains 'utm' survives
    assert(canon("https://h.example.com/p?autumn=1")
      == "https://h.example.com/p?autumn=1")
  }

  test("normalizePercentEncoding: RFC 3986 unreserved decode + hex case") {
    def norm(u: String): String = Seq(u).toDF("u")
      .select(UrlFns.normalizePercentEncoding($"u")).as[String].head()
    // unreserved decodes, case-insensitively on the hex digits
    assert(norm("/a%7eb%7Ec%41") == "/a~b~cA")
    // reserved stays encoded, hex uppercased
    assert(norm("/a%2fb%3A") == "/a%2Fb%3A")
    // malformed escapes pass through verbatim; trailing % survives
    assert(norm("/a%zzb%7") == "/a%zzb%7")
    assert(norm("100%") == "100%")
    // multi-byte UTF-8 sequences are reserved-class: hex-normalized only
    assert(norm("/caf%c3%a9") == "/caf%C3%A9")
    // double-percent: empty part passes through
    assert(norm("a%%41b") == "a%Ab")
  }

  test("registeredDomain: public-suffix-list longest match + default rule") {
    val got = Seq("a.b.example.com", "example.com", "localhost",
        "a.b.example.co.uk", "example.co.uk", "co.uk", "x.gov.br")
      .toDF("h").select(UrlFns.registeredDomain($"h")).as[String].collect()
    assert(got.toSeq == Seq(
      "example.com", "example.com", "localhost",
      // PSL match: co.uk is the public suffix, so the registrable part
      // keeps THREE labels (the r15 two-label rule returned "co.uk")
      "example.co.uk", "example.co.uk",
      // a host that IS a public suffix has no registrable part
      "co.uk", "x.gov.br"))
  }

  test("q261 shape: canonicalization alone removes the synthetic re-crawls") {
    val out = graft.Queries43.q261UrlDedupDomains(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 6 && out.map(_._1).toSeq ==
      Seq("example0.co.uk", "example0.com", "example1.co.uk",
        "example1.com", "example2.co.uk", "example2.com"))
    // every raw URL is unique (per-doc utm_campaign + fragment); all
    // duplicate mass comes from the canonicalization. Canonical keys per
    // domain are bounded by |sources| * 5 * 7 by construction.
    val nSources = graft.io.Tables.documents(spark, sfDir)
      .select(countDistinct($"source")).as[Long].head()
    for (r <- out) {
      assert(r._3 <= 35L * nSources, s"bound 35*$nSources: $r")
      assert(r._4 == (r._2 - r._3) * 1000000L / r._2)
    }
  }
}

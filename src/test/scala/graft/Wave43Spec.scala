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

  test("registeredDomain: public-suffix-lite last-two-labels rule") {
    val got = Seq("a.b.example.com", "example.com", "localhost")
      .toDF("h").select(UrlFns.registeredDomain($"h")).as[String].collect()
    assert(got.toSeq == Seq("example.com", "example.com", "localhost"))
  }

  test("q261 shape: canonicalization alone removes the synthetic re-crawls") {
    val out = graft.Queries43.q261UrlDedupDomains(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 3 && out.map(_._1).toSeq ==
      Seq("example0.com", "example1.com", "example2.com"))
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

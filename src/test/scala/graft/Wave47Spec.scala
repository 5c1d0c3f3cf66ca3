package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlFns

/** Wave 47: PSL wildcard/exception rules + host percent-escape decision. */
class Wave47Spec extends SparkSpec {
  import spark.implicits._

  /** One job per case table (the Wave43Spec batching pattern — a
    * per-assert collect would pay plan+job overhead ~20 times over). */
  private def domAll(cases: Seq[(String, String)]): Unit = {
    val got = cases.map(_._1).toDF("h")
      .select(UrlFns.registeredDomain($"h")).as[String].collect().toSeq
    for (((h, want), g) <- cases.zip(got))
      assert(g == want, s"$h -> $g (want $want)")
  }

  test("registeredDomain: wildcard rules (*.ck, *.kawasaki.jp)") {
    domAll(Seq(
      // *.ck: any label under ck is a public suffix -> registrable keeps 3
      "a.b.foo.ck" -> "b.foo.ck",
      "b.foo.ck" -> "b.foo.ck",
      // host IS a wildcard public suffix -> unchanged
      "foo.ck" -> "foo.ck",
      // bare base: wildcard needs a label under it; default rule inert at
      // one label -> unchanged
      "ck" -> "ck",
      // 2-label wildcard base (3-label rule): registrable keeps 4
      "www.shop.foo.kawasaki.jp" -> "shop.foo.kawasaki.jp",
      "shop.foo.kawasaki.jp" -> "shop.foo.kawasaki.jp",
      // host IS the wildcard public suffix (base + one label) -> unchanged
      "foo.kawasaki.jp" -> "foo.kawasaki.jp",
      // the bare 2-label base itself: no rule matches a 2-label host
      // except the default -> last two = the host
      "kawasaki.jp" -> "kawasaki.jp"))
  }

  test("registeredDomain: exception rules beat wildcards (!www.ck, " +
    "!city.kawasaki.jp)") {
    domAll(Seq(
      "www.ck" -> "www.ck",
      "deep.path.www.ck" -> "www.ck",
      "city.kawasaki.jp" -> "city.kawasaki.jp",
      "a.city.kawasaki.jp" -> "city.kawasaki.jp",
      // a NON-excepted sibling still follows the wildcard
      "a.town.kawasaki.jp" -> "a.town.kawasaki.jp"))
  }

  test("registeredDomain: plain entries and the default rule unchanged " +
    "by the wildcard extension (the q261 contract)") {
    domAll(Seq(
      "a.b.example.co.uk" -> "example.co.uk",
      "example.com" -> "example.com",
      "a.b.example.com" -> "example.com",
      "localhost" -> "localhost",
      "co.uk" -> "co.uk"))
  }

  test("oracle list constraints: the q270/q271 CASE arms cover every " +
    "shipped rule shape (the Queries43 pslSql gate, asserted directly)") {
    assert(UrlFns.publicSuffixes.forall(_.count(_ == '.') == 1),
      "a 3+-label plain PSL entry needs a new oracle arm in Queries47")
    assert(UrlFns.publicSuffixWildcards.forall(w =>
      Set(0, 1)(w.count(_ == '.'))),
      "a 3+-label wildcard base needs a new oracle arm in Queries47")
    assert(UrlFns.publicSuffixExceptions.forall(e =>
      Set(1, 2)(e.count(_ == '.'))),
      "a 4+-label exception rule needs a new oracle arm in Queries47")
    // every shipped exception sits under a shipped wildcard (PSL
    // semantics: an exception cancels a covering wildcard rule)
    assert(UrlFns.publicSuffixExceptions.forall(e =>
      UrlFns.publicSuffixWildcards.contains(e.split("\\.", 2)(1))),
      "an exception without its covering wildcard is dead PSL data")
  }

  test("canonicalizeUrl: host percent-escapes — unreserved decodes then " +
    "case-folds; reserved hex ends lowercase in the HOST, uppercase in " +
    "the path (the documented q272 decision)") {
    def canon(u: String): String =
      Seq(u).toDF("u").select(UrlFns.canonicalizeUrl($"u")).as[String].head()
    assert(canon("HTTP://H%41S%2fT.Example.COM:80/P%41th%2f?b=2&utm_x=1#f")
      == "http://has%2ft.example.com/PAth%2F?b=2")
  }

  test("parsePslRules: the publicsuffix.org file format round-trips into " +
    "registeredDomain (the swap-in stance, executable)") {
    // a verbatim-format snippet: comments, blanks, a plain 2-label rule,
    // a 3-LABEL plain rule (beyond the shipped subset's shape - the
    // ENGINE matcher is fully general), a wildcard, and its exception
    val (plain, wild, exc) = UrlFns.parsePslRules(Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "", "com", "co.uk", "pref.hokkaido.jp", "*.ck", "!www.ck",
      "// ===END ICANN DOMAINS==="))
    assert(plain == Seq("co.uk", "pref.hokkaido.jp"), plain.toString)
    assert(wild == Seq("ck") && exc == Seq("www.ck"))
    val got = Seq("a.b.site.pref.hokkaido.jp", "x.co.uk", "shop.foo.ck",
        "deep.www.ck", "plain.com", "pref.hokkaido.jp").toDF("h")
      .select(UrlFns.registeredDomain($"h", plain, wild, exc))
      .as[String].collect().toSeq
    assert(got == Seq(
      // the 3-label plain rule matches and keeps FOUR labels
      "site.pref.hokkaido.jp", "x.co.uk", "shop.foo.ck", "www.ck",
      // 'com' was dropped as single-label: the default rule covers it
      "plain.com",
      // a host that IS a 3-label plain suffix passes through unchanged
      // (ADVICE r17: the default rule used to truncate it to
      // 'hokkaido.jp'; only the scaladoc'd pass-through is correct)
      "pref.hokkaido.jp"), got.toString)
  }

  test("q271 shape: the exception arm collapses onto ONE domain; the " +
    "wildcard arm fans out per (source, id mod 3)") {
    val out = Queries47.q271PslRollup(spark, sfDir)
      .as[(String, Long, Long)].collect()
    val byDom = out.map(r => r._1 -> r).toMap
    // arm 6 (city exception) and arm 3 (!www.ck) each collapse to one
    // domain; every host in the www.ck arm maps to the SAME domain even
    // though the hosts differ per (source, id%3)
    assert(byDom.contains("www.ck") && byDom.contains("city.kawasaki.jp"))
    assert(byDom("www.ck")._3 > 1L,
      s"distinct hosts under www.ck should exceed 1: ${byDom("www.ck")}")
    assert(byDom("city.kawasaki.jp")._3 == 1L)
    // wildcard arms never leak a bare public suffix as a domain
    assert(!byDom.contains("kawasaki.jp") && !byDom.contains("ck"))
  }
}

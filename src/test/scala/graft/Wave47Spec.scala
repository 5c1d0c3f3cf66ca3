package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlFns

/** Wave 47: PSL wildcard/exception rules + host percent-escape decision. */
class Wave47Spec extends SparkSpec {
  import spark.implicits._

  private def dom(h: String): String =
    Seq(h).toDF("h").select(UrlFns.registeredDomain($"h")).as[String].head()

  test("registeredDomain: wildcard rules (*.ck, *.kawasaki.jp)") {
    // *.ck: any label under ck is a public suffix -> registrable keeps 3
    assert(dom("a.b.foo.ck") == "b.foo.ck")
    assert(dom("b.foo.ck") == "b.foo.ck")
    // host IS a wildcard public suffix -> unchanged
    assert(dom("foo.ck") == "foo.ck")
    // bare base: wildcard needs a label under it; default rule inert at
    // one label -> unchanged
    assert(dom("ck") == "ck")
    // 2-label wildcard base (3-label rule): registrable keeps 4
    assert(dom("www.shop.foo.kawasaki.jp") == "shop.foo.kawasaki.jp")
    assert(dom("shop.foo.kawasaki.jp") == "shop.foo.kawasaki.jp")
    // host IS the wildcard public suffix (base + one label) -> unchanged
    assert(dom("foo.kawasaki.jp") == "foo.kawasaki.jp")
    // the bare 2-label base itself: no rule matches a 2-label host
    // except the default -> last two = the host
    assert(dom("kawasaki.jp") == "kawasaki.jp")
  }

  test("registeredDomain: exception rules beat wildcards (!www.ck, " +
    "!city.kawasaki.jp)") {
    assert(dom("www.ck") == "www.ck")
    assert(dom("deep.path.www.ck") == "www.ck")
    assert(dom("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(dom("a.city.kawasaki.jp") == "city.kawasaki.jp")
    // a NON-excepted sibling still follows the wildcard
    assert(dom("a.town.kawasaki.jp") == "a.town.kawasaki.jp")
  }

  test("registeredDomain: plain entries and the default rule unchanged " +
    "by the wildcard extension (the q261 contract)") {
    assert(dom("a.b.example.co.uk") == "example.co.uk")
    assert(dom("example.com") == "example.com")
    assert(dom("a.b.example.com") == "example.com")
    assert(dom("localhost") == "localhost")
    assert(dom("co.uk") == "co.uk")
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

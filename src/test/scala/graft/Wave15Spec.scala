package graft

import org.apache.spark.sql.functions._

import graft.ops.{Delta, Synthesize, Vocab}

/** Wave 15: FIM / span-corruption synthesis, diversity, novelty. */
class Wave15Spec extends SparkSpec {
  import spark.implicits._

  test("fimTransform: PSM reassembles to the original; raw passthrough") {
    val docs = Seq((0L, "abcdefghij"), (1L, "abcdefghij"), (2L, "ab"))
      .toDF("id", "text")
    val out = Synthesize.fimTransform(docs, "id", "text")
      .as[(Long, String, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // id 1 is odd -> raw; id 2 is even but too short -> raw
    assert(out(1L) == ((1L, "raw", 10L, 0L, 0L, "abcdefghij")))
    assert(out(2L) == ((2L, "raw", 2L, 0L, 0L, "ab")))
    // id 0: gated; lengths partition the doc and PSM carries every char
    val (_, mode, np, nm, ns, rendered) = out(0L)
    assert(mode == "psm" && np + nm + ns == 10L && np >= 1L)
    val m = "<PRE>(.*)<SUF>(.*)<MID>(.*)".r
    rendered match {
      case m(p, s, mid) =>
        assert(p + mid + s == "abcdefghij")
        assert(p.length == np && mid.length == nm && s.length == ns)
      case _ => fail(s"bad rendering: $rendered")
    }
  }

  test("fimTransform: cut points are deterministic id functions") {
    // id 0: c1 = 1 + 0 % 9 = 1, c2 = 1 -> lo = hi = 1: empty middle
    val out = Synthesize.fimTransform(
        Seq((0L, "abcdefghij")).toDF("id", "text"), "id", "text")
      .as[(Long, String, Long, Long, Long, String)].collect().head
    assert(out == ((0L, "psm", 1L, 0L, 9L, "<PRE>a<SUF>bcdefghij<MID>")))
  }

  test("spanCorrupt: hand-checked window, sentinel pairing, empty doc") {
    // doc 0: 12 tokens t0..t11; window 0 offset = 0 % 8 = 0 -> corrupt
    // t0-t2; window 1 offset = (0 + 2654435761) % 8 = 1 -> corrupt t11
    // (positions 10.. only t11 at in-window 1)
    val docs = Seq(
      (0L, (0 to 11).map(i => s"t$i").mkString(" ")),
      (5L, "")).toDF("id", "text")
    val out = Synthesize.spanCorrupt(docs, "id", "text")
      .as[(Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(5L) == ((5L, 0L, 0L, "", "")))
    val (_, nt, nc, inp, tgt) = out(0L)
    assert(nt == 12L)
    // window 1 has tokens at in-window 0 (t10) and 1 (t11); offset 1
    // corrupts t11 only
    assert(nc == 4L)
    assert(inp == "<X0> t3 t4 t5 t6 t7 t8 t9 t10 <X1>")
    assert(tgt == "<X0> t0 t1 t2 <X1> t11")
  }

  test("spanCorrupt: T5 invariant — input+target token mass covers the doc") {
    val docs = Seq((3L, (0 to 24).map(i => s"w$i").mkString(" ")))
      .toDF("id", "text")
    val (_, nt, nc, inp, tgt) =
      Synthesize.spanCorrupt(docs, "id", "text")
        .as[(Long, Long, Long, String, String)].collect().head
    val inTok = inp.split(" ").filterNot(_.startsWith("<X"))
    val tgTok = tgt.split(" ").filterNot(_.startsWith("<X"))
    assert(inTok.length + tgTok.length == nt)
    assert(tgTok.length == nc)
    // reassembly: kept + dropped = original token multiset
    assert((inTok ++ tgTok).sorted.toSeq ==
      (0 to 24).map(i => s"w$i").sorted)
  }

  test("distinctNgramReport: hand-checked distinct-2") {
    val docs = Seq(
      ("en", "a b a b"), // bigrams: "a b","b a","a b" -> 3 total, 2 distinct
      ("en", "a b"),     // +1 "a b" -> totals 4/2
      ("fr", "x"),       // no bigrams
      ("fr", "x y")).toDF("lang", "text")
    val out = Vocab.distinctNgramReport(docs, "lang", "text", 2)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("en") == (("en", 4L, 2L, 500000L)))
    assert(out("fr") == (("fr", 1L, 1L, 1000000L)))
  }

  test("shingleNovelty: containment against the previous corpus") {
    val prev = Seq((1L, "a b c d")).toDF("id", "text") // trigrams: abc, bcd
    val cur = Seq(
      (2L, "a b c x"),  // shingles: "a b c" (contained), "b c x" (novel)
      (3L, "q r"),      // too short -> 0 shingles -> novelty 1e6
      (4L, "a b c d")). // both contained -> novelty 0
      toDF("id", "text")
    val out = Delta.shingleNovelty(prev, cur, "id", "text", 3)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(2L) == ((2L, 2L, 1L, 500000L)))
    assert(out(3L) == ((3L, 0L, 0L, 1000000L)))
    assert(out(4L) == ((4L, 2L, 2L, 0L)))
  }
}

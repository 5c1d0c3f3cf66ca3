package graft

import org.apache.spark.sql.functions._

import graft.ops.{Audit, Journey}

/** Wave 29: Benford audit, Gini concentration, decay scoring, session
  * paths, linear attribution. */
class Wave29Spec extends SparkSpec {
  import spark.implicits._

  test("benford: digit extraction, ppm math, non-positive dropped") {
    // 6 values: digits 1,1,1,2,9; zero and negative dropped
    val df = Seq(123L, 19L, 1L, 250L, 9L, 0L, -5L).toDF("units")
    val out = Audit.benford(df, "units")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("1") == (("1", 3L, 600000L, 301029L, 298971L)))
    assert(out("2")._2 == 1L && out("2")._3 == 200000L)
    assert(out("9")._2 == 1L)
    assert(!out.contains("0") && out.size == 3)
  }

  test("giniByGroup: equal values ~0, one-owner ~1, small group NULL") {
    // group e: 2000 equal values -> gini ~ 0 (exactly (n-1)/n - 1 scaled
    // -> floor to 0 from the rank identity); group o: one owner holds
    // everything -> (n-1)/n; group s: too small for the scaled denom
    val e = (1 to 2000).map(i => ("e", 1000L, i.toLong))
    val o = (1 to 1999).map(i => ("o", 0L, i.toLong)) :+ (("o", 2000000L, 2000L))
    val s = Seq(("s", 5L, 1L))
    val out = Audit.giniByGroup((e ++ o ++ s).toDF("g", "x", "id"),
        "g", "x", "id")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // equal: 2*S1 = 2*total*(n+1)/2 = (n+1)*total -> exactly 0
    assert(out("e")._4.contains(0L))
    // one owner: G = (n-1)/n = 1999/2000 = 0.9995 -> 999500 ppm
    assert(out("o")._4.exists(g => g >= 999000L && g <= 1000000L))
    assert(out("s")._4.isEmpty)
  }

  test("decayScore: shift-decay halves by age bucket, cap holds") {
    // ref day = 28 (max). ages in weeks: 0 -> h=0, 4w -> h=1, 8w -> h=2
    val us = 86400000000L
    val ev = Seq(
      (1L, 28L * us, 1.0),    // h=0: 10000
      (1L, 0L * us, 1.0),     // age 28d = 4w -> h=1: 5000
      (2L, 28L * us, 0.5),    // h=0: 5000
      (2L, -28L * us, 2.0))   // age 56d = 8w -> h=2: 5000
      .map { case (u, t, v) => (u, new java.sql.Timestamp(t / 1000L), v) }
      .toDF("u", "ts", "v")
    val out = Journey.decayScore(ev, "u", "ts", "v", halfLifeWeeks = 4)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 20000L, 15000L)))
    assert(out(2L) == ((2L, 2L, 25000L, 10000L)))
  }

  test("sessionPaths: depth cap, gap split, sorted collect") {
    val base = 1700000000000000L
    val min = 60000000L
    // user 1, one session: a,b,c,d -> path a>b>c (depth 3)
    // then a 40-min gap -> new session: just "a"
    val ev = Seq(
      (1L, base, 1L, "a"), (1L, base + min, 2L, "b"),
      (1L, base + 2 * min, 3L, "c"), (1L, base + 3 * min, 4L, "d"),
      (1L, base + 45 * min, 5L, "a"),
      (2L, base, 6L, "a"))
      .map { case (u, t, e, ty) =>
        (u, new java.sql.Timestamp(t / 1000L), e, ty) }
      .toDF("u", "ts", "eid", "ty")
    val out = Journey.sessionPaths(ev, "u", "ts", "eid", "ty", 30, 3)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a>b>c") == (("a>b>c", 1L, 1L)))
    assert(out("a") == (("a", 2L, 2L)))
    assert(out.size == 2)
  }

  test("linearAttribution: equal split, lookback, direct bucket") {
    val base = 1700000000000000L
    val day = 86400000000L
    val ev = Seq(
      // user 1: view + click then buy 3.0 -> 1.5 each
      (1L, base, 1L, "view", 0.0), (1L, base + 1, 2L, "click", 0.0),
      (1L, base + 2, 3L, "buy", 3.0),
      // user 2: touch outside the 30d lookback -> direct
      (2L, base - 31 * day, 4L, "view", 0.0),
      (2L, base, 5L, "buy", 7.0),
      // user 3: duplicate channel counts once
      (3L, base, 6L, "view", 0.0), (3L, base + 1, 7L, "view", 0.0),
      (3L, base + 2, 8L, "buy", 2.0))
      .map { case (u, t, e, ty, v) =>
        (u, new java.sql.Timestamp(t / 1000L), e, ty, v) }
      .toDF("u", "ts", "eid", "ty", "v")
    val out = Journey.linearAttribution(ev, "u", "ts", "eid", "ty", "v",
        "buy", 30L * 86400L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(out("view") == ((2L, 35000L)))   // 15000 (u1) + 20000 (u3)
    assert(out("click") == ((1L, 15000L)))
    assert(out("(direct)") == ((1L, 70000L)))
  }
}

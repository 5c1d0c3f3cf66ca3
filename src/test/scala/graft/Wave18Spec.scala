package graft

import org.apache.spark.sql.functions._

import graft.ops.{Preference, RankEval, Sketch, Vocab}

/** Wave 18: count-min / HLL sketches, GRPO rank advantages, coverage
  * budgets, trimmed means. */
class Wave18Spec extends SparkSpec {
  import spark.implicits._

  test("countMinSketch/cmsEstimate: overestimates only, exact when alone") {
    val toks = (Seq.fill(100)("heavy") ++ Seq.fill(7)("light") ++
      Seq("rare")).toDF("token")
    val cms = Sketch.countMinSketch(toks, "token", 4, 1024)
    // sketch never exceeds depth x width rows regardless of input
    assert(cms.count() <= 4L * 1024L)
    val cand = Seq("heavy", "light", "rare", "absent").toDF("token")
    val est = Sketch.cmsEstimate(cms, cand, "token", 4, 1024)
      .as[(String, Long)].collect().toMap
    // CMS errors are one-sided
    assert(est("heavy") >= 100L && est("light") >= 7L && est("rare") >= 1L)
    // 4 tokens in 4096 cells: no collisions, estimates exact
    assert(est("heavy") == 100L && est("absent") == 0L)
  }

  test("hllRegisters/hllEstimate: dense registers, sane estimates") {
    val toks = (1 to 2000).map(i => ("big", s"tok$i")) ++
      (1 to 5).flatMap(i => Seq(("small", s"w$i"), ("small", s"w$i")))
    val df = toks.toDF("g", "token")
    val regs = Sketch.hllRegisters(df, "g", "token", 8)
    // complete dense sketch: exactly m registers per group, ranks in range
    assert(regs.groupBy("g").count().as[(String, Long)].collect().toMap
      .forall(_._2 == 256L))
    assert(regs.filter(col("mreg") < 0 || col("mreg") > 25).count() == 0)
    val est = Sketch.hllEstimate(regs, "g", 8)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // 5 distinct in the small group -> linear-counting branch, near-exact
    assert(est("small")._3 > 0L)
    assert(math.abs(est("small")._5 - 5L) <= 1L)
    // 2000 distinct at m=256: sigma ~ 1.04/16 -> assert within 25%
    assert(math.abs(est("big")._5 - 2000L) <= 500L)
  }

  test("hll literal tables: alpha and linear-counting anchors") {
    assert(Sketch.hllAlphaE6(256) >= 717000L && Sketch.hllAlphaE6(256) <= 719000L)
    val lc = Sketch.linearCountTable(256).toMap
    assert(lc(256L) == 0L)                  // no empty registers -> ln(1)
    assert(lc(1L) == 1420L)                 // 256 ln 256 = 1419.56
    assert(lc(128L) == 177L)                // 256 ln 2 = 177.45
  }

  test("groupRankAdvantage: centered scaled ranks, singleton zero") {
    val cand = Seq((1L, 10L, 900000L), (1L, 11L, 500000L), (1L, 12L, 100000L),
      (2L, 20L, 700000L),
      (3L, 30L, 400000L), (3L, 31L, 400000L)).toDF("g", "id", "score")
    val out = Preference.groupRankAdvantage(cand, "g", "id", "score")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    assert(out((1L, 10L)) == 1000000L && out((1L, 11L)) == 0L &&
      out((1L, 12L)) == -1000000L)
    assert(out((2L, 20L)) == 0L) // singleton: no relative signal
    // tie broken by id: 30 ranks first
    assert(out((3L, 30L)) == 1000000L && out((3L, 31L)) == -1000000L)
  }

  test("coverageBudget: types needed per mass threshold") {
    val docs = Seq(("g", "a a a b c")).toDF("lang", "text")
    val out = Vocab.coverageBudget(docs, "lang", "text",
        Seq(500000L, 900000L))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // counts a:3 b:1 c:1 (tot 5): 50% at 1 type (cov 600000), 90% at 3
    assert(out == (("g", 3L, 5L, 1L, 3L, 600000L, 1000000L)))
  }

  test("trimmedMean: outlier drop, small-group fallback") {
    val s = Seq((1L, 1L, 0L), (1L, 2L, 100000L), (1L, 3L, 200000L),
      (1L, 4L, 900000L),
      (2L, 5L, 100000L), (2L, 6L, 300000L)).toDF("task", "id", "score")
    val out = RankEval.trimmedMean(s, "task", "id", "score", 1)
      .as[(Long, Long, Long, Long, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    // task 1: mean 300000, trimmed (100000+200000)/2 = 150000
    assert(out(1L) == ((1L, 4L, 300000L, 150000L, true, -150000L)))
    // task 2: n = 2 <= 2*trim -> plain mean, flagged untrimmed
    assert(out(2L) == ((2L, 2L, 200000L, 200000L, false, 0L)))
  }
}

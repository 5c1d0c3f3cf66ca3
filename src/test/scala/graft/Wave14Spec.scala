package graft

import org.apache.spark.sql.functions._

import graft.ops.{RankEval, Sft}

/** Wave 14: pass@k estimation and prefix-cache capacity planning. */
class Wave14Spec extends SparkSpec {
  import spark.implicits._

  test("passAtK: hand-checked estimator, short tasks dropped") {
    // task 1: n=4, c=2 -> pass@1 = 1 - 2/4 = 0.5
    //   pass@2 = 1 - (2*1)/(4*3) = 5/6 -> 833334 ppm (1e6 - 166666)
    //   pass@4: n-c=2 < 4 -> exactly 1
    // task 2: n=4, c=0 -> all zeros; task 3: n=3 -> dropped (< max k)
    val samples = Seq(
      (1L, true), (1L, true), (1L, false), (1L, false),
      (2L, false), (2L, false), (2L, false), (2L, false),
      (3L, true), (3L, true), (3L, true)).toDF("task_id", "ok")
    val out = RankEval.passAtK(samples, "task_id", col("ok"), Seq(1, 2, 4))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1L, 4L, 2L, 500000L, 833334L, 1000000L)))
    assert(out(2L) == ((2L, 4L, 0L, 0L, 0L, 0L)))
  }

  test("passAtK: c = n gives pass 1 at every k; monotone in k") {
    val samples = Seq.tabulate(8)(i => (1L, true)) ++
      Seq.tabulate(8)(i => (2L, i % 4 == 0))
    val out = RankEval.passAtK(samples.toDF("task_id", "ok"), "task_id",
        col("ok"), Seq(1, 2, 4))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 8L, 8L, 1000000L, 1000000L, 1000000L)))
    // pass@k is monotone nondecreasing in k (more draws, more chances)
    val (_, _, _, p1, p2, p4) = out(2L)
    assert(p1 <= p2 && p2 <= p4)
    // k=1 is the plain rate: 2/8
    assert(p1 == 250000L)
  }

  test("prefixCacheReport: LCP via sorted extremes, savings arithmetic") {
    val prompts = Seq(
      ("a", "sys: x\nhello world"),
      ("a", "sys: x\nhelp me"),
      ("a", "sys: x\nhelicopter"),
      ("b", "solo prompt"),
      ("c", ""), ("c", "")).toDF("route", "prompt")
    val out = Sft.prefixCacheReport(prompts, "route", "prompt")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // route a: LCP("sys: x\nhel...") = "sys: x\nhel" -> 10 chars
    val a = out("a")
    assert(a._4 == 10L && a._2 == 3L)
    assert(a._5 == 2L * 10L) // (n-1) * lcp
    assert(a._6 == a._5 * 1000000L / a._3)
    // singleton route: the whole prompt is "shared", zero saved
    val b = out("b")
    assert(b._4 == 11L && b._5 == 0L && b._6 == 0L)
    // empty prompts: lcp 0, no div-by-zero
    val cRow = out("c")
    assert(cRow._3 == 0L && cRow._4 == 0L && cRow._6 == 0L)
  }
}

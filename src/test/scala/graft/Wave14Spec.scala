package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bitext, Mixture, Preference, RankEval, Sft}

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

  test("bestOfN: reward floor, fingerprint dedup, top-n rank") {
    // prompt 1: ids 1..5; id 3 is below the floor; ids 1/2 share a
    // fingerprint (2 wins on reward); survivors ranked 2 > 4 > 1... n=2
    val cand = Seq(
      (1L, 1L, 700000L, "fpA"), (1L, 2L, 900000L, "fpA"),
      (1L, 3L, 300000L, "fpB"), (1L, 4L, 800000L, "fpC"),
      (1L, 5L, 600000L, "fpD"),
      (2L, 6L, 500000L, "fpA")).toDF("p", "id", "score", "fp")
    val out = Preference.bestOfN(cand, "p", "id", "score", "fp",
        minScore = 400000L, n = 2)
      .select("p", "id", "rank").as[(Long, Long, Long)].collect().toSet
    // fpA keeps id 2 only; id 3 dropped by floor; top-2 = {2 (rank 1), 4 (rank 2)}
    assert(out == Set((1L, 2L, 1L), (1L, 4L, 2L), (2L, 6L, 1L)))
  }

  test("bestOfN: reward tie within a fingerprint keeps the smaller id") {
    val cand = Seq(
      (1L, 9L, 500000L, "x"), (1L, 4L, 500000L, "x")).toDF("p", "id", "score", "fp")
    val out = Preference.bestOfN(cand, "p", "id", "score", "fp", 1L, 5)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(4L))
  }

  test("doremiWeights: above-average-loss domains gain weight, sum ≈ 1e6") {
    // domain a: loss 800k avg; b: 200k; corpus avg 500k -> a upweights
    val rows = Seq.tabulate(4)(i => ("a", 800000L)) ++
      Seq.tabulate(4)(i => ("b", 200000L))
    val out = Mixture.doremiWeights(rows.toDF("dom", "loss"), "dom",
        col("loss"), rounds = 4, etaPpm = 250000L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, na, lossA, exA, wA) = out("a")
    val (_, _, _, exB, wB) = out("b")
    assert(na == 4L && lossA == 800000L && exA == 300000L && exB == 0L)
    assert(wA > wB && wA > 500000L)
    // renormalized each round: total stays within integer-div slack
    assert(math.abs((wA + wB) - 1000000L) <= 2L)
    // hand-check round 1: u_a = 1e6*(1e6+250000*300000 div 1e6) div 1e6
    // = 1075000; u_b = 1e6; w_a after renorm = 1075000e6 div 2075000
    val r1 = Mixture.doremiWeights(rows.toDF("dom", "loss"), "dom",
        col("loss"), rounds = 1, etaPpm = 250000L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(r1("a") == 1075000L * 1000000L / 2075000L)
  }

  test("marginMine: hand-checked ratio margins on exact cosines") {
    // 2-d unit vectors with exactly-representable cosines: src 1 = (1,0)
    // aligns with tgt 11; src 2 = (0.6,0.8) sits between both targets.
    // All sims ∈ {1.0, 0.6, 0.8, 0.0} after 6-dp rounding.
    val src = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.6f, 0.8f))).toDF("id", "vec")
    val tgt = Seq(
      (11L, Array(1.0f, 0.0f)),
      (12L, Array(0.0f, 1.0f))).toDF("id", "vec")
    val all = Bitext.marginMine(src, "id", "vec", tgt, "id", "vec",
        k = 2, minMarginPpm = 0L)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // shifted sums: fwd(1) = 2e6+1e6; fwd(2) = 1.6e6+1.8e6;
    // bwd(11) = 2e6+1.6e6; bwd(12) = 1.8e6+1e6
    val m1 = 2000000L * 8L * 1000000L / ((3000000L + 3600000L) * 2L)
    val m2 = 1800000L * 8L * 1000000L / ((3400000L + 2800000L) * 2L)
    assert(all(1L) == ((1L, 11L, 1000000L, m1)))
    assert(all(2L) == ((2L, 12L, 800000L, m2)))
    assert(m1 > m2)
    // threshold between the two mines only the aligned pair
    val mined = Bitext.marginMine(src, "id", "vec", tgt, "id", "vec",
        k = 2, minMarginPpm = (m2 + m1) / 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(mined.map(_._1).toSeq == Seq(1L))
  }

  test("marginMine: truncation-aware neighborhoods when |tgt| < k") {
    val src = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "vec")
    val tgt = Seq((11L, Array(1.0f, 0.0f))).toDF("id", "vec")
    val out = Bitext.marginMine(src, "id", "vec", tgt, "id", "vec",
        k = 5, minMarginPpm = 0L)
      .as[(Long, Long, Long, Long)].collect()
    // single pair: both neighborhoods are that pair -> margin exactly 1e6
    assert(out.toSeq == Seq((1L, 11L, 1000000L, 1000000L)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.Mixture

/** Training-mix construction semantics: budgeted stratified sampling and
  * deterministic weighted repetition (the corpus → pretraining-mix step). */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L), ("a", 4L, 100L),
    ("b", 5L, 50L), ("b", 6L, 50L),
    ("c", 7L, 999L))
    .toDF("stratum", "id", "toks")

  test("tokenBudgetSample: per-stratum running total never exceeds the budget") {
    val out = Mixture.tokenBudgetSample(docs, "stratum", "id", col("toks"), budget = 250L)
      .select($"stratum", $"id", $"cum_tokens")
      .collect()
    val byStratum = out.groupBy(_.getString(0))
    // a: 4×100 → only 2 fit under 250; b: both fit (100 ≤ 250); c: 999 > 250 → none
    assert(byStratum.get("a").map(_.length).contains(2))
    assert(byStratum.get("b").map(_.length).contains(2))
    assert(!byStratum.contains("c"))
    assert(out.forall(_.getLong(2) <= 250L))
  }

  test("tokenBudgetSample: selection is rerun-stable (hash order, no RNG)") {
    def run() = Mixture.tokenBudgetSample(docs, "stratum", "id", col("toks"), 250L)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(run() == run())
  }

  test("tokenBudgetSample: bounded slice is a survivor superset that actually prunes") {
    // one skewed stratum, 5000 rows of 10 tokens, budget 200 → ~20 survivors;
    // the md5-prefix bucket cutoff must bound the window input near the
    // budget's worth of rows, not the whole stratum
    val skewed = spark.range(0, 5000)
      .select(lit("big").as("stratum"), $"id", lit(10L).as("toks"))
    val bounded = Mixture.boundedSlice(skewed, "stratum", "id", col("toks"), 200L)
    val boundedIds = bounded.select($"id").as[Long].collect().toSet
    val survivors = Mixture.tokenBudgetSample(skewed, "stratum", "id", col("toks"), 200L)
      .select($"id").as[Long].collect().toSet
    assert(survivors.subsetOf(boundedIds), "prefilter dropped a survivor")
    assert(boundedIds.size < 500,
      s"prefilter kept ${boundedIds.size} of 5000 — no real pruning")
    assert(survivors.size == 20)
  }

  test("tokenBudgetSample: bounded form is row-identical to the naive window spelling") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 3000).select(
      concat(lit("s"), $"id" % 3).as("stratum"), $"id",
      ($"id" % 13).as("toks")) // includes zero-token rows
    val w = Window.partitionBy($"stratum")
      .orderBy(md5($"id".cast("string")).asc, $"id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("cum_tokens", sum($"toks").over(w).cast("long"))
      .filter($"cum_tokens" <= 500L)
      .select($"stratum", $"id", $"cum_tokens")
      .as[(String, Long, Long)].collect().sorted.toSeq
    val got = Mixture.tokenBudgetSample(df, "stratum", "id", col("toks"), 500L)
      .select($"stratum", $"id", $"cum_tokens")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(got == naive)
  }

  test("tokenBudgetSample: zero-token rows at exactly the budget survive (strict cutoff)") {
    // all-zero tokens, budget 0: every cum_tokens == 0 ≤ 0 → ALL rows kept.
    // A >=-cutoff regression would prune every bucket after the first.
    val zeros = spark.range(0, 200).select(lit("z").as("stratum"), $"id", lit(0L).as("toks"))
    val n = Mixture.tokenBudgetSample(zeros, "stratum", "id", col("toks"), 0L).count()
    assert(n == 200L)
  }

  test("tokenBudgetSample plan: bucket prefilter runs below the stratum window exchange") {
    val plan = Mixture.tokenBudgetSample(docs, "stratum", "id", col("toks"), 250L)
      .queryExecution.executedPlan.toString
    // cutoffs arrive by broadcast (big side never shuffles before bounding)
    // and the bucket-range filter references them before the window sort
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast cutoff join:\n$plan")
    assert(plan.contains("__graft_cut"), s"expected bucket-cutoff prefilter:\n$plan")
    val windowAt = plan.indexOf("Window")
    val filterAt = plan.indexOf("__graft_cut")
    assert(windowAt >= 0 && filterAt > windowAt,
      "prefilter must appear BELOW the window in the plan tree (tree prints top-down)")
  }

  test("repeatWeighted: integer part repeats every row, fraction selects by hash, zero drops") {
    val out = Mixture.repeatWeighted(docs, "stratum", "id",
        weights = Map("a" -> 2.5, "b" -> 0.0), defaultWeight = 1.0)
      .select($"id", $"copy").as[(Long, Long)].collect()
    val counts = out.groupBy(_._1).view.mapValues(_.length).toMap
    // every 'a' row appears 2 or 3 times; 'b' rows vanish; 'c' appears once
    Seq(1L, 2L, 3L, 4L).foreach(id => assert(counts(id) == 2 || counts(id) == 3))
    assert(!counts.contains(5L) && !counts.contains(6L))
    assert(counts(7L) == 1)
    // copies are numbered 1..n
    val copiesOf1 = out.filter(_._1 == 1L).map(_._2).sorted.toSeq
    assert(copiesOf1 == (1L to copiesOf1.length).toSeq)
  }

  test("repeatWeighted: fractional selection hits the expected rate at volume") {
    val many = spark.range(0, 2000).select(lit("s").as("stratum"), $"id")
    val n = Mixture.repeatWeighted(many, "stratum", "id", Map("s" -> 1.5)).count()
    // expectation 3000; md5 draw is uniform → ±5% is generous at n=2000
    assert(n > 2850 && n < 3150, s"got $n, expected ≈3000")
  }

  test("repeatWeighted plans map-side only: no exchange before the explode") {
    val plan = Mixture.repeatWeighted(docs, "stratum", "id", Map("a" -> 2.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("temperatureAlloc alpha=0.5: flattens the head, upsamples the tail, stays in budget") {
    // strata with 90000 / 9000 / 900 tokens: natural shares 90/9/0.9%;
    // sqrt masses 300/94.9/30 -> allocated shares ~70.6/22.3/7.1%
    val d = Seq.tabulate(100)(i => (s"r$i", "big", 900L)) ++
      Seq.tabulate(10)(i => (s"m$i", "mid", 900L)) ++
      Seq(("s0", "small", 900L))
    val out = Mixture.temperatureAlloc(
      d.toDF("id", "stratum", "toks"), "stratum", col("toks"), budget = 10000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val (bigN, bigA, bigE) = out("big")
    val (midN, midA, midE) = out("mid")
    val (smallN, smallA, smallE) = out("small")
    assert((bigN, midN, smallN) == ((90000L, 9000L, 900L)))
    // allocation sums to <= budget (floor rounding loses at most |strata|-1)
    assert(bigA + midA + smallA <= 10000L && bigA + midA + smallA >= 10000L - 2)
    // head share shrinks vs natural (90% -> ~70%), tail grows (0.9% -> ~7%)
    assert(bigA < 7100 && bigA > 7000, s"big=$bigA")
    assert(smallA > 700, s"small=$smallA")
    // epochs: head is DOWN-sampled (<1e6 ppm would need budget<corpus; here
    // budget is 10% of corpus so all are <1e6, but ordering must invert)
    assert(bigE < midE && midE < smallE, s"epochs must favor the tail: $bigE $midE $smallE")
  }

  test("temperatureAlloc alpha=1 is proportional; deterministic across reruns") {
    val d = Seq(("a", "x", 3000L), ("b", "y", 1000L)).toDF("id", "stratum", "toks")
    val out = Mixture.temperatureAlloc(d, "stratum", col("toks"), 4000L, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("x") == 3000L && out("y") == 1000L)
    val again = Mixture.temperatureAlloc(d, "stratum", col("toks"), 4000L, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out == again)
  }

  test("temperatureAlloc: decimal product survives a 10^12 budget times a 10^12 mass") {
    // 10^12-token stratum -> mass6 = sqrt(1e12)*1e6 = 1e12; budget 1e12:
    // the product is 1e24, far past long range — must not overflow/corrupt
    val d = Seq(("a", "x", 1000000000000L), ("b", "y", 1000000000000L))
      .toDF("id", "stratum", "toks")
    val out = Mixture.temperatureAlloc(d, "stratum", col("toks"), 1000000000000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("x") == 500000000000L && out("y") == 500000000000L, out.toString)
  }

  test("epochOrder: dense positions, per-epoch reshuffle, partition-stable") {
    val d = (1L to 40L).toDF("id")
    val out = Mixture.epochOrder(d, "id", epochs = 3)
      .select($"epoch".cast("int"), $"id", $"position")
      .as[(Int, Long, Long)].collect()
    // dense 0..119 across all (epoch, id) pairs, epochs in blocks
    assert(out.map(_._3).sorted.toSeq == (0L until 120L))
    assert(out.forall { case (e, _, p) => p / 40 == e })
    // epochs genuinely reshuffle: within-epoch id sequences differ
    def seqOf(e: Int) = out.filter(_._1 == e).sortBy(_._3).map(_._2).toSeq
    assert(seqOf(0) != seqOf(1) && seqOf(1) != seqOf(2))
    // order is a pure function of (epoch, id): repartitioning cannot move it
    val again = Mixture.epochOrder(d.repartition(7), "id", epochs = 3)
      .select($"epoch".cast("int"), $"id", $"position")
      .as[(Int, Long, Long)].collect()
    assert(out.sortBy(_._3).toSeq == again.sortBy(_._3).toSeq)
  }
}

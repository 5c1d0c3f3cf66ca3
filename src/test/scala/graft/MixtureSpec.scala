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
}

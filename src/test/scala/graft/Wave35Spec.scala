package graft

import org.apache.spark.sql.functions._

import graft.ops.{Audit, Mixture, Quantiles}

/** Wave 35: global-order analytics on the two-phase rank/cumsum —
  * token-budget best-first selection, the Lorenz concentration table,
  * exact order statistics over an all-distinct domain. */
class Wave35Spec extends SparkSpec {
  import spark.implicits._

  test("budgetSelection: best-first, inclusive boundary, over-budget tail dropped") {
    val docs = Seq(
      // (id, score, tokens) — ranked by score desc then id asc:
      // c(90,30) a(80,30) d(80,25) b(10,100): cum 30,60,85,185
      ("a", 80L, 30L), ("b", 10L, 100L), ("c", 90L, 30L), ("d", 80L, 25L))
      .toDF("id", "score", "tokens")
    val got = Mixture.budgetSelection(docs, "id", "score", "tokens", 85L)
      .select($"rank", $"id", $"cum_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "c", 30L), (2L, "a", 60L), (3L, "d", 85L)))
    // budget 84: d's cum (85) exceeds — exactly two survive
    val two = Mixture.budgetSelection(docs, "id", "score", "tokens", 84L)
      .select($"id").as[String].collect().sorted.toSeq
    assert(two == Seq("a", "c"))
  }

  test("lorenzCurve: hand-checked buckets and cumulative shares") {
    // entities by value desc: k4(40) k3(30) k2(20) k1(10); n=4, B=2 →
    // bucket = ceil(rank/2): {k4,k3}→1 (cum 70), {k2,k1}→2 (cum 100)
    val facts = Seq(("k1", 10L), ("k2", 20L), ("k3", 30L), ("k4", 40L))
      .toDF("k", "v")
    val got = Audit.lorenzCurve(facts, "k", "v", 2)
      .select($"bucket", $"n_entities", $"value_sum", $"cum_value",
        $"cum_share_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 70L, 70L, 700000L),
      (2L, 2L, 30L, 100L, 1000000L)))
  }

  test("lorenzCurve aggregates facts per entity before ranking") {
    val facts = Seq(("a", 5L), ("a", 5L), ("b", 30L)).toDF("k", "v")
    val got = Audit.lorenzCurve(facts, "k", "v", 1)
      .select($"bucket", $"n_entities", $"value_sum", $"cum_share_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 40L, 1000000L)))
  }

  test("orderStatistics: rank-ceil values match the sorted-collect truth") {
    val n = 1003
    val df = spark.range(1, n + 1)
      .select(($"id" * 2654435761L % 999983L).as("v"), $"id".as("t"))
    val got = Quantiles.orderStatistics(df, "v", "t", Seq(50, 90, 99, 100))
      .select($"p", $"rank", $"v").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val sorted = df.select($"v", $"t").as[(Long, Long)].collect()
      .sortBy(identity).map(_._1)
    val want = Seq(50, 90, 99, 100).map { p =>
      val r = (p.toLong * n + 99) / 100
      (p.toLong, r, sorted((r - 1).toInt))
    }
    assert(got == want)
  }

  test("giniGlobal: hand-checked rank formulation, degenerate cases") {
    // x = (1,2,3,4), n=4, tot=10, Σi·x = 1+4+9+16 = 30:
    // G = (60 − 50)/40 = 0.25
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("x", "t")
    val got = graft.ops.Audit.giniGlobal(df, "x", "t")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((4L, 10L, 250000L)))
    // perfect equality → 0; all mass on one row of n → (n−1)/n
    val eq = graft.ops.Audit.giniGlobal(
      Seq((5L, "a"), (5L, "b")).toDF("x", "t"), "x", "t")
      .as[(Long, Long, Long)].collect().head
    assert(eq._3 == 0L)
    val conc = graft.ops.Audit.giniGlobal(
      Seq((0L, "a"), (0L, "b"), (0L, "c"), (9L, "d")).toDF("x", "t"),
      "x", "t").as[(Long, Long, Long)].collect().head
    assert(conc._3 == 750000L) // (n−1)/n = 3/4
  }

  test("coverageDepth: entities to reach each share, rank-ceil targets") {
    // per-entity values desc: 50, 30, 15, 5 (tot 100)
    val facts = Seq(("a", 50L), ("b", 30L), ("c", 15L), ("d", 5L))
      .toDF("k", "v")
    val got = graft.ops.Audit.coverageDepth(facts, "k", "v",
        Seq(500000L, 800000L, 990000L, 1000000L))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((500000L, 1L, 50L), (800000L, 2L, 80L),
      (990000L, 4L, 100L), (1000000L, 4L, 100L)))
  }

  test("overlapAtK: full-outer queries, integer jaccard/containment") {
    val a = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L)).toDF("q", "id")
    val b = Seq((1L, 11L), (1L, 12L), (1L, 13L), (3L, 30L)).toDF("q", "id")
    val got = graft.ops.RankEval.overlapAtK(a, b, "q", "id")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 2L, Some(500000L), Some(666666L)),
      (2L, 1L, 0L, 0L, Some(0L), Some(0L)),
      (3L, 0L, 1L, 0L, Some(0L), None)))
  }

  test("weightedOrderStatistics: cumulative-weight cutoffs, hand-checked") {
    // values 1..4 with weights 1,1,6,2 (W=10): cw = 1,2,8,10
    // p50 → target 5 → first cw≥5 is value 3; p80 → 8 → 3; p90 → 9 → 4
    val df = Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 6L, "c"), (4L, 2L, "d"))
      .toDF("v", "w", "t")
    val got = Quantiles.weightedOrderStatistics(df, "v", "w", "t",
        Seq(50, 80, 90))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((50L, 5L, 3L), (80L, 8L, 3L), (90L, 9L, 4L)))
    // weight ≡ 1 degenerates to plain order statistics
    val ones = df.withColumn("w", lit(1L))
    val a = Quantiles.weightedOrderStatistics(ones, "v", "w", "t", Seq(50, 100))
      .select($"p", $"v").as[(Long, Long)].collect().sorted.toSeq
    val b = Quantiles.orderStatistics(ones, "v", "t", Seq(50, 100))
      .select($"p", $"v").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("orderStatistics: duplicate target ranks emit one row per requested p") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("v", "t")
    // n=2: p=50→rank 1, p=51..100→rank 2 — ps (99, 100) share rank 2
    val got = Quantiles.orderStatistics(df, "v", "t", Seq(99, 100))
      .select($"p", $"rank", $"v").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((99L, 2L, 2L), (100L, 2L, 2L)))
  }
}

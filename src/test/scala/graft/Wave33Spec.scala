package graft

import org.apache.spark.sql.functions._

import graft.ops.{Audit, Dedup, Mixture}

/** Wave 33: sampler uniformity, variance allocation, near-miss pairs. */
class Wave33Spec extends SparkSpec {
  import spark.implicits._

  test("samplerUniformity: exact chi2 on a hand-checkable split") {
    // k=2: chi2 = (2*o0 - n)^2 + (2*o1 - n)^2 over (2n); o0 + o1 = n, so
    // both terms equal (2*o0 - n)^2
    val df = (1L to 100L).toDF("id")
    val out = Audit.samplerUniformity(df, col("id").cast("string"), 2)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (n, k, seen, chi2, dof) = out
    assert(n == 100L && k == 2L && dof == 1L && seen == 2L)
    // recompute expectation from the same hash in Spark
    val o0 = df.select(pmod(graft.functions.HashFns.md5Long(
        col("id").cast("string"), 8), lit(2L)).as("b"))
      .filter(col("b") === 0L).count()
    // chi2 = Σ(k·o − n)² / (k·n); both buckets contribute (2·o0 − n)²
    val expected = 2L * (2 * o0 - 100L) * (2 * o0 - 100L) * 1000000L / 200L
    assert(chi2 == expected)
  }

  test("samplerUniformity: empty buckets are charged, not ignored") {
    // one row -> 1 bucket seen of 4; chi2 = ((4-1)^2 + 3*1) * 1e6 / 4 = 3e6
    val df = Seq(1L).toDF("id")
    val out = Audit.samplerUniformity(df, col("id").cast("string"), 4)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out._1 == 1L && out._3 == 1L)
    assert(out._4 == 3000000L)
  }

  test("samplerUniformity: the degenerate sampler it exists to flag doesn't overflow") {
    // 100k rows of ONE key → one bucket holds everything: the squared
    // deviation (k·n − n)² ≈ 4e13, ×1e6 ≈ 4e19 > 2^63 — the old all-long
    // spelling aborted (ANSI) right on the pathological case the audit
    // targets; the decimal(38,0) path reports it. Closed form for total
    // skew: chi2 = n·(k−1), so chi2_e6 = n·(k−1)·1e6.
    val n = 100000L
    val k = 64
    val df = spark.range(n).select(lit("constant-key").as("id"))
    val out = Audit.samplerUniformity(df, col("id"), k)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out._1 == n && out._3 == 1L)
    assert(out._4 == n * (k - 1) * 1000000L)
  }

  test("varianceAllocation: spread stratum gets the budget, cap holds") {
    // flat: var 0; spread: large var; tiny: cap at n
    val flat = (1 to 50).map(_ => ("flat", 100L))
    val spread = (1 to 50).map(i => ("spread", if (i % 2 == 0) 0L else 200L))
    val tiny = Seq(("tiny", 0L), ("tiny", 1000L))
    val out = Mixture.varianceAllocation(
        (flat ++ spread ++ tiny).toDF("s", "v"), "s", "v", budget = 100L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("flat")._3 == 0L && out("flat")._4 == 0L)
    assert(out("spread")._3 > 0L)
    assert(out("tiny")._4 <= 2L)                 // capped at stratum size
    val total = out.values.map(_._4).sum
    assert(total <= 100L)
  }

  test("varianceAllocation: all-constant strata fall back to n-share") {
    val df = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("b", 7L))
      .toDF("s", "v")
    val out = Mixture.varianceAllocation(df, "s", "v", budget = 8L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(out("a") == 3L && out("b") == 1L)     // capped at n, n-prop
  }

  test("nearMissPairs: band respected, jaccard labels attached") {
    // identical docs -> hamming 0 (below band, excluded); disjoint text
    // in the same bucket is unlikely — assert band bounds on fixture-free
    // synthetic data by checking output invariants only
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon eta theta"),
      (4L, "totally different words entirely here now"))
      .toDF("doc_id", "text")
    val out = Dedup.nearMissPairs(docs, "doc_id", "text", 1, 32)
      .as[(Long, Long, Long, Double)].collect()
    // the exact-dup pair (1,2) has hamming 0 -> excluded even at lo=1
    assert(!out.exists(r => r._1 == 1L && r._2 == 2L))
    assert(out.forall(r => r._3 >= 1L && r._3 <= 32L))
    assert(out.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // the near pair (1,3)/(2,3) carries a mid-range jaccard when blocked
    // together; if bucketed apart the miner honestly misses it (LSH)
    out.filter(r => r._2 == 3L).foreach(r => assert(r._4 > 0.2 && r._4 < 1.0))
  }
}

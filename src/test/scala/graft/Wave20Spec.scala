package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, Linalg, Mixture, Scrub, Sketch}

/** Wave 20: power iteration, triangle counting, priority sampling,
  * k-anonymity, HLL shard merge. */
class Wave20Spec extends SparkSpec {
  import spark.implicits._

  test("powerIterationTop: recovers the dominant axis, converged") {
    // variance 100x larger along axis 0 than axis 1; axes 2,3 dead
    val rows = (1 to 40).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Seq(sign * (1.0 + i % 5 * 0.1), 0.1 * (i % 3 - 1), 0.0, 0.0))
    }
    val out = Linalg.powerIterationTop(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", rounds = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 4)
    val v = out.map(_._2)
    // dominant component is axis 0 at full normalized magnitude
    assert(math.abs(v(0)) == v.map(math.abs).max)
    assert(math.abs(v(0)) >= 900000L)
    assert(math.abs(v(1)) < math.abs(v(0)) / 3)
    // dead axes stay (near) zero; converged cos^2 ~ 1e6
    assert(math.abs(v(2)) < 10000L && math.abs(v(3)) < 10000L)
    assert(out.head._3 > 990000L)
  }

  test("triangleStats: one triangle + pendant edge") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (2L, 1L), (2L, 2L)).toDF("a", "b") // dup + self-loop must be ignored
    val out = Graph.triangleStats(edges, "a", "b")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, 1000000L)))
    assert(out(2L) == ((2L, 2L, 1L, 1000000L)))
    // node 3: deg 3, one triangle of 3 possible pairs -> 1/3
    assert(out(3L) == ((3L, 3L, 1L, 333333L)))
    assert(out(4L) == ((4L, 1L, 0L, 0L)))
  }

  test("prioritySample: small stratum exact, large stratum k + tau") {
    val small = (1 to 3).map(i => ("s", i.toLong, 10L))
    val big = (10 to 109).map(i => ("b", i.toLong, 5L + i % 7))
    val out = Mixture.prioritySample((small ++ big).toDF("g", "id", "w"),
        "g", "id", "w", 5)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val s = out.filter(_._1 == "s")
    val b = out.filter(_._1 == "b")
    // stratum below k: everything kept, tau 0, ht = w exactly
    assert(s.length == 3 && s.forall(r => r._5 == 0L && r._6 == r._3))
    // stratum above k: exactly k rows, positive tau, ht >= w, priority >= w
    assert(b.length == 5 && b.forall(r => r._5 > 0L && r._6 >= r._3
      && r._4 >= r._3))
    // kept priorities all exceed the threshold
    assert(b.forall(r => r._4 >= r._5))
  }

  test("kAnonymity: flags groups under k") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 1), ("b", 2))
      .toDF("q1", "q2")
    val out = Scrub.kAnonymity(df, Seq("q1", "q2"), 3L)
      .as[(String, Int, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("a", 1)) == ((3L, false)))
    assert(out(("b", 1)) == ((1L, true)) && out(("b", 2)) == ((1L, true)))
  }

  test("hllMergeAll: register-wise max equals the union's registers") {
    val toks = (1 to 300).map(i => ("s1", s"t$i")) ++
      (200 to 500).map(i => ("s2", s"t$i"))
    val df = toks.toDF("g", "t")
    val regs = Sketch.hllRegisters(df, "g", "t", 8)
    val merged = Sketch.hllMergeAll(regs, "g", "u")
      .select("reg", "mreg").as[(Long, Long)].collect().toMap
    val direct = Sketch.hllRegisters(df.withColumn("g", lit("u")), "g", "t", 8)
      .select("reg", "mreg").as[(Long, Long)].collect().toMap
    assert(merged == direct)
    // and the merged estimate tracks the exact union (500 distinct)
    val est = Sketch.hllEstimate(Sketch.hllMergeAll(regs, "g"), "g", 8)
      .select("hll_estimate").as[Long].head()
    assert(math.abs(est - 500L) < 150L)
  }
}

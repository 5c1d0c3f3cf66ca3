package graft

import org.apache.spark.sql.functions._

import graft.ops.{Audit, Journey, Series}

/** Wave 30: ABC classification, weekday seasonality, reconciliation,
  * inter-event intervals, lateness profile. */
class Wave30Spec extends SparkSpec {
  import spark.implicits._

  test("abcClassification: cumulative cuts, boundary goes to higher class") {
    // values 50, 30, 15, 5 -> cum ppm 500000, 800000, 950000, 1000000
    val facts = Seq((1L, 50L), (2L, 30L), (3L, 15L), (4L, 5L))
      .toDF("k", "v")
    val out = Audit.abcClassification(facts, "k", "v")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_._4).toSeq == Seq(500000L, 800000L, 950000L, 1000000L))
    // 800000 <= aPpm -> A (boundary counts as the higher class);
    // 950000 <= bPpm -> B
    assert(out.map(_._5).toSeq == Seq("A", "A", "B", "C"))
  }

  test("abcClassification: value ties broken by key") {
    val facts = Seq((9L, 10L), (2L, 10L)).toDF("k", "v")
    val out = Audit.abcClassification(facts, "k", "v")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq(2L, 9L))
  }

  test("weekdayProfile: exact lower medians and lift") {
    val us = 86400000000L
    // group g: day 0 (thu) counts 3; day 7 (thu) 1; day 1 (fri) 5
    // thu median over [3,1] = lower = 1; fri = 5; all-week [1,3,5] = 3
    val rows =
      (1 to 3).map(i => ("g", 0L * us + i)) ++
      Seq(("g", 7L * us + 1)) ++
      (1 to 5).map(i => ("g", 1L * us + i))
    val ev = rows.map { case (g, t) =>
      (g, new java.sql.Timestamp(t / 1000L)) }.toDF("g", "ts")
    val out = Series.weekdayProfile(ev, "g", "ts")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    assert(out(0L) == (("g", 0L, 2L, 1L, 333333L)))
    assert(out(1L) == (("g", 1L, 1L, 5L, 1666666L)))
  }

  test("reconcile: orphans, childless, mismatches beyond tolerance") {
    val parents = Seq((1L, 10.00), (2L, 5.00), (3L, 7.00))
      .toDF("pk", "amount")
    val children = Seq((1L, 6.00), (1L, 4.00), (3L, 1.00), (9L, 2.00))
      .toDF("fk", "camount")
    val out = Audit.reconcile(parents, children, "pk", "fk",
        "amount", "camount", toleranceE2 = 50L)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("orphan_child", 9L)) == 1L)         // one orphan row
    assert(out(("childless_parent", 2L)) == 0L)
    assert(out(("amount_mismatch", 3L)) == 600L)     // 700 - 100 cents
    assert(out.size == 3)                            // parent 1 reconciles
  }

  test("interEventIntervals: per-user gaps in whole days, type filter") {
    val us = 86400000000L
    val ev = Seq(
      (1L, 0L, 1L, "p"), (1L, 3 * us, 2L, "p"), (1L, 4 * us, 3L, "p"),
      (1L, 2 * us, 4L, "x"),                   // other type ignored
      (2L, 0L, 5L, "p"), (2L, 3 * us, 6L, "p"))
      .map { case (u, t, e, ty) =>
        (u, new java.sql.Timestamp(t / 1000L), e, ty) }
      .toDF("u", "ts", "eid", "ty")
    val out = Journey.interEventIntervals(ev, "u", "ts", "eid", "ty", "p")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(3L) == ((2L, 2L)))   // two 3-day gaps from two users
    assert(out(1L) == ((1L, 1L)))
    assert(out.size == 2)
  }

  test("latenessProfile: running high-water-mark lateness per type") {
    // ingest order (eid): t=10, t=30, t=20 (10s late), t=30 (0 late)
    val ev = Seq(
      ("a", 10L, 1L), ("a", 30L, 2L), ("a", 20L, 3L), ("a", 30L, 4L),
      ("b", 5L, 5L))
      .map { case (ty, s, e) =>
        (ty, new java.sql.Timestamp(s * 1000L), e) }
      .toDF("ty", "ts", "eid")
    val out = Journey.latenessProfile(ev, "ty", "ts", "eid")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 4L, 250000L, 10L, 10L)))
    assert(out("b") == (("b", 1L, 0L, 0L, 0L)))
  }
}

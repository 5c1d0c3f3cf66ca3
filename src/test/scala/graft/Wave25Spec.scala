package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Analyze, Series}

/** Wave 25: cohort retention, forward fill, column profile. */
class Wave25Spec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Long): Timestamp = new Timestamp(day * 86400000L)

  test("cohortRetention: week-0 is always 1e6, later offsets shrink") {
    // u1,u2 first seen week 0; u1 returns week 1; u3 first seen week 1
    val ev = Seq((1L, ts(0)), (2L, ts(1)), (1L, ts(8)), (3L, ts(9)))
      .toDF("user_id", "ts")
    val out = Series.cohortRetention(ev, "user_id", "ts")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out((0L, 0L)) == ((0L, 0L, 2L, 2L, 1000000L)))
    assert(out((0L, 1L)) == ((0L, 1L, 1L, 2L, 500000L)))
    assert(out((1L, 0L)) == ((1L, 0L, 1L, 1L, 1000000L)))
    assert(out.size == 3)
  }

  test("forwardFillDaily: gaps carry the last value, leading gap stays null") {
    // group g: values on day 2 and day 5; span 2..5, days 3-4 filled
    val ev = Seq(("g", ts(2), 1.5), ("g", ts(5), 2.0))
      .toDF("event_type", "ts", "value")
    val out = Series.forwardFillDaily(ev, "event_type", "ts", "value")
      .as[(String, Long, Option[Long], Boolean)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq == Seq(2L, 3L, 4L, 5L))
    assert(out.map(_._3).toSeq == Seq(Some(15000L), Some(15000L),
      Some(15000L), Some(20000L)))
    assert(out.map(_._4).toSeq == Seq(false, true, true, false))
  }

  test("columnProfile: nulls, distincts, min/max per column in one scan") {
    val df = Seq((Some(3L), "b"), (None, "a"), (Some(7L), "a"))
      .toDF("k", "s")
    val out = Analyze.columnProfile(df, Seq("k"), Seq("s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("k") == (("k", 3L, 1L, 2L, "3", "7")))
    assert(out("s") == (("s", 3L, 0L, 2L, "a", "b")))
  }
}

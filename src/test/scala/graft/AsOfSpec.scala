package graft

import java.sql.Timestamp

import graft.ops.AsOf

/** As-of join semantics: inclusive match at equal timestamps, latest-prior
  * selection, and left-join null handling. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val right = Seq(
    ("u1", ts(10), 100L, "r10"),
    ("u1", ts(20), 101L, "r20"),
    ("u2", ts(5), 102L, "r5"))
    .toDF("user_id", "ts", "event_id", "tag")

  private val left = Seq(
    ("u1", ts(15), 1L),  // matches r10 (latest <= 15)
    ("u1", ts(20), 2L),  // matches r20 (inclusive at equal ts)
    ("u1", ts(9), 3L),   // no prior right row
    ("u3", ts(99), 4L))  // no right rows at all
    .toDF("user_id", "ts", "event_id")

  test("inner as-of keeps only matched probes, picking the latest prior-or-equal") {
    val out = AsOf.asOfJoin(left, right, "user_id", "ts",
        payload = Seq("event_id", "tag"), tieCol = "event_id")
      .select($"event_id", $"asof_tag").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "r10", 2L -> "r20"))
  }

  test("left as-of keeps unmatched probes with null payload") {
    val out = AsOf.asOfJoin(left, right, "user_id", "ts",
        payload = Seq("tag"), tieCol = "event_id", joinType = "left")
      .select($"event_id", $"asof_tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("r10"), 2L -> Some("r20"), 3L -> None, 4L -> None))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Graph, Series}

/** Wave 26: funnel conversion windows, personalized PageRank. */
class Wave26Spec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("funnelConversion: deadline respected, same-user only") {
    val ev = Seq(
      (1L, 10L, ts(0), "view"), (2L, 10L, ts(100), "click"), // converts
      (3L, 20L, ts(0), "view"), (4L, 20L, ts(5000), "click"), // too late
      (5L, 30L, ts(0), "view"), (6L, 40L, ts(50), "click"),   // other user
      (7L, 50L, ts(0), "click"))                              // no purchase
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Series.funnelConversion(ev, "user_id", "ts", "event_type",
        "event_id", Seq(("view", "click"), ("click", "purchase")), 3600L)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out(("view", "click")) == (("view", "click", 3L, 1L, 333333L)))
    // 4 click events, none followed by a purchase
    assert(out(("click", "purchase")) == (("click", "purchase", 4L, 0L, 0L)))
  }

  test("personalizedPageRank: mass concentrates near the seed") {
    // seed-rooted DAG: 1 -> {2,3}, 2 -> 4; detached cycle 8 <-> 9 gets
    // no teleport and must decay to exactly 0
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (8L, 9L), (9L, 8L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = Graph.personalizedPageRankPpb(edges, "src", "dst", seeds, 8)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 && !out(2L)._3)
    assert(out(8L)._2 == 0L && out(9L)._2 == 0L)
    // monotone decay with hop distance from the refilled seed
    assert(out(1L)._2 > out(2L)._2)
    assert(out(2L)._2 == out(3L)._2) // symmetric one-hop children
    assert(out(2L)._2 > out(4L)._2 && out(4L)._2 > 0L)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Wave 23: mutual-kNN confirmation and span-position profile (q196/q198
  * are compositions of already-spec'd operators, oracle-proven at three
  * scales). */
class Wave23Spec extends SparkSpec {
  import spark.implicits._

  test("mutualRankFilter: hub edges die, reciprocal pairs survive") {
    // A-B are each other's #1; hub H is everyone's #2 but ranks only
    // A and B inside ITS top-2 (C is H's #3) -> (C,H) must not survive m=2
    val pairs = Seq(
      (1L, 2L, 0.99), // A-B reciprocal best
      (1L, 9L, 0.80), // A-H
      (2L, 9L, 0.79), // B-H
      (3L, 9L, 0.70)) // C-H: H's rank-3
      .toDF("id_a", "id_b", "sim")
    val out = Similarity.mutualRankFilter(pairs, 2)
      .select("id_a", "id_b", "rank_ab", "rank_ba")
      .as[(Long, Long, Long, Long)].collect().map(r => (r._1, r._2) -> r).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L))._3 == 1L
      && out((1L, 2L))._4 == 1L)
    assert(out.contains((1L, 9L)) && out.contains((2L, 9L)))
    assert(!out.contains((3L, 9L))) // C ranks H #1 but H ranks C #3
    assert(out.size == 3)
  }

  test("spanPositionProfile: repeated span lands in the right deciles") {
    // 20-token docs; the same 4-token span sits at positions 1 (doc 1,
    // first occurrence -> not cut), 17 (doc 2 -> decile (17-1)*10/20 = 8)
    val span = "aa bb cc dd"
    val pad1 = (1 to 16).map(i => s"x$i").mkString(" ")
    val pad2 = (1 to 16).map(i => s"y$i").mkString(" ")
    val docs = Seq((1L, s"$span $pad1"), (2L, s"$pad2 $span"))
      .toDF("doc_id", "text")
    val out = Dedup.spanPositionProfile(docs, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out == Map(8L -> ((8L, 1L, 1L))))
  }
}

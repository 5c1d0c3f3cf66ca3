package graft

import org.apache.spark.sql.functions._

import graft.ops.Ids

/** Global-id assignment semantics: dense, 0-based, total-order-correct,
  * and invariant to partition count (the property monotonically_increasing_id
  * lacks and the no-partition window can't deliver at scale). */
class IdsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    ("b", 10L), ("a", 5L), ("a", 3L), ("c", 1L), ("b", 2L), ("a", 9L))
    .toDF("lang", "doc_id")

  test("globalIndex equals row_number over the total order, 0-based and dense") {
    val got = Ids.globalIndex(docs, Seq($"lang", $"doc_id"), "idx")
      .orderBy($"idx").select($"lang", $"doc_id", $"idx")
      .as[(String, Long, Long)].collect().toSeq
    val want = docs.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(identity).zipWithIndex.map { case ((l, d), i) => (l, d, i.toLong) }.toSeq
    assert(got == want)
  }

  test("globalIndex is invariant to the partition count") {
    def ids(parts: Int) =
      Ids.globalIndex(docs, Seq($"lang", $"doc_id"), "idx", Some(parts))
        .select($"doc_id", $"idx").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(ids(1) == ids(3) && ids(3) == ids(7))
  }
}

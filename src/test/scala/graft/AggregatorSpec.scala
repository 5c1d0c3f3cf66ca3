package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators

/** Typed Aggregator UDAFs: deterministic output regardless of partition
  * layout, and the top-k buffer stays bounded. */
class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("sortedList is deterministic across partitionings") {
    val data = Seq(("g1", "c"), ("g1", "a"), ("g1", "b"), ("g2", "z"))
    val agg = Aggregators.sortedList.toColumn.name("ids")
    def run(parts: Int) =
      data.toDS().repartition(parts).groupByKey(_._1)
        .mapValues(_._2).agg(agg)
        .collect().toMap
    val one = run(1); val many = run(7)
    assert(one == many)
    assert(one("g1") == Seq("a", "b", "c") && one("g2") == Seq("z"))
  }

  test("topKByScore keeps the k best with deterministic tiebreak") {
    val data = (1 to 100).map(i => ("g", (s"id$i", (i % 10).toLong)))
    val agg = Aggregators.topKByScore(3).toColumn.name("top")
    val out = data.toDS().repartition(5).groupByKey(_._1)
      .mapValues(_._2).agg(agg)
      .collect().head._2
    // scores 9 appear for id9, id19, ..., tie broken by id asc
    assert(out == Seq("id19", "id29", "id39"))
  }
}

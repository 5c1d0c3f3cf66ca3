package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, Linalg, Shard, Vocab}

/** Wave 21: all-but-the-top deflation, collocations, cluster-aware
  * folds, k-core peeling. */
class Wave21Spec extends SparkSpec {
  import spark.implicits._

  test("allButTop: removing the top direction kills its variance") {
    val rows = (1 to 40).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Seq(sign * (1.0 + i % 5 * 0.1), 0.1 * (i % 3 - 1), 0.0, 0.0))
    }
    val out = Linalg.allButTop(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", rounds = 8)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val (n, vv, before, after, reductionPpm, totalVar, topSharePpm) = out
    assert(n == 40L && vv > 0L && totalVar > 0L)
    // the dominant direction carried nearly everything; deflation
    // removes ≥ 99.9% of it and the residual is fixed-point noise
    assert(before > 0L && after < before / 1000L)
    assert(reductionPpm > 999000L)
    assert(topSharePpm > 900000L)
  }

  test("collocations: high-lift pair ranks first, count floor holds") {
    // "aaa bbb" always adjacent (lift >> 1); "ccc"/"ddd" frequent but
    // paired with everything (lift ~ 1); "eee fff" rare (below floor)
    val docs = (1 to 20).map(i => s"aaa bbb ccc ddd x$i ccc ddd") ++
      Seq("eee fff", "eee fff")
    val out = Vocab.collocations(docs.toDF("text"), "text", 5L, 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // no pair below the count floor
    assert(out.forall(_._3 >= 5L))
    assert(!out.exists(r => r._1 == "eee"))
    // the always-adjacent pair outranks the independent frequent pair
    val liftAaaBbb = out.find(r => (r._1, r._2) == (("aaa", "bbb"))).get._6
    val liftCccDdd = out.find(r => (r._1, r._2) == (("ccc", "ddd"))).get._6
    assert(liftAaaBbb > liftCccDdd)
  }

  test("clusterAwareFolds: duplicates land in one fold, ids are cluster reps") {
    val docs = Seq((1L, "Same  Text"), (2L, "same text"), (3L, "same TEXT "),
      (10L, "unique one"), (11L, "unique two")).toDF("doc_id", "text")
    val out = Shard.clusterAwareFolds(docs, "doc_id", "text", 5)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // normalization collapses case/whitespace: 1,2,3 share cluster rep 1
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._3).distinct.size == 1)
    assert(out(10L)._2 == 10L && out(11L)._2 == 11L)
    // folds in range
    assert(out.values.forall(r => r._3 >= 0L && r._3 < 5L))
  }

  test("kCorePeel: pendant trees peel away, cycles survive") {
    // triangle 1-2-3 with a pendant path 3-4-5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val core2 = Graph.kCorePeel(edges, "a", "b", 2L, 8)
      .as[(Long, Long)].collect().toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // the triangle has no 3-core (every node degree 2)
    assert(Graph.kCorePeel(edges, "a", "b", 3L, 8).count() == 0L)
  }
}

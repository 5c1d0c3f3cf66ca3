package graft

import org.apache.spark.sql.functions._
import graft.ops.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(vertexIds: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val v = vertexIds.toDF("id")
    val e = edges.toDF("a", "b")
    Components.connectedComponents(v, "id", e, "a", "b")
      .as[(Long, Long)].collect().toMap
  }

  test("connectedComponents: long chain collapses to its minimum") {
    // a 40-hop path — the exact shape where one-hop label propagation
    // needs diameter rounds; the star algorithm must still converge
    val n = 40L
    val out = cc(1L to n, (1L until n).map(i => (i, i + 1)))
    assert(out.values.toSet == Set(1L))
  }

  test("connectedComponents: chain with ids adversarial to min-propagation") {
    // min id in the middle, ids zig-zag so the argmin chain is unhelpful
    val ids = Seq(7L, 3L, 9L, 1L, 8L, 4L, 6L)
    val edges = ids.zip(ids.tail)
    val out = cc(ids, edges)
    assert(out.values.toSet == Set(1L))
  }

  test("connectedComponents: multiple components and isolated vertices") {
    val out = cc(
      Seq(1L, 2L, 3L, 10L, 11L, 20L),
      Seq((2L, 3L), (1L, 2L), (10L, 11L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents: duplicate, reversed, and self-loop edges are harmless") {
    val out = cc(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("connectedComponents: no edges at all") {
    val out = cc(Seq(5L, 6L), Seq.empty)
    assert(out == Map(5L -> 5L, 6L -> 6L))
  }

  test("dedupClusters: sizes and canonical flags") {
    val v = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Components.dedupClusters(v, "id", e, "a", "b")
      .select($"id", $"component", $"comp_size", $"is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (4L, 4L, 1L, true)))
  }
}

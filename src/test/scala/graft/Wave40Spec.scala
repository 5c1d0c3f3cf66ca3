package graft

import org.apache.spark.sql.functions._

import graft.expr.HashKernels
import graft.ops.{Rag, Shard}

/** Wave 40: jump consistent hashing, the three-scheme reshard report, and
  * the groundedness span-size sweep. */
class Wave40Spec extends SparkSpec {
  import spark.implicits._

  test("jumpHash: range, n=1 degenerate, and bucket balance") {
    val n = 64
    val shards = (0L until 20000L).map(HashKernels.jumpHash(_, n))
    assert(shards.forall(s => s >= 0 && s < n))
    assert((0L until 500L).forall(HashKernels.jumpHash(_, 1) == 0L))
    // 20k keys over 64 shards: expected 312.5/shard; a correct jump hash
    // balances like a uniform hash (binomial σ ≈ 17.6) — bound at ±40%
    val counts = shards.groupBy(identity).view.mapValues(_.size)
    assert(counts.size == n)
    assert(counts.values.min > 180 && counts.values.max < 440,
      s"min=${counts.values.min} max=${counts.values.max}")
  }

  test("jumpHash: grow-by-append moves the minimum, only onto new shards") {
    // the paper's property: growing 64 -> 80 moves a key iff a NEW shard
    // wins it - probability 1 - 64/80 = 20%, and a moved key always lands
    // in [64, 80) (survivor shards never exchange keys)
    val keys = 0L until 20000L
    val moved = keys.map(k =>
      (HashKernels.jumpHash(k, 64), HashKernels.jumpHash(k, 80)))
      .filter { case (a, b) => a != b }
    assert(moved.forall(_._2 >= 64), "a moved key landed on a survivor shard")
    val frac = moved.size.toDouble / keys.size
    assert(frac > 0.15 && frac < 0.25, s"moved fraction $frac")
  }

  test("jumpShard column matches the kernel and plans map-side") {
    val df = spark.range(0, 1000).select($"id".as("doc_id"))
    val got = df.select($"doc_id", Shard.jumpShard($"doc_id", 17).as("s"))
      .as[(Long, Long)].collect()
    assert(got.forall { case (id, s) => s == HashKernels.jumpHash(id, 17) })
    val plan = df.select(Shard.jumpShard($"doc_id", 17))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("reshardStability3: mod/rendezvous rows equal the 2-scheme report, jump row counted exactly") {
    val ids = spark.range(0, 400).select($"id".as("doc_id"))
    val three = Shard.reshardStability3(ids, "doc_id", 8, 10)
      .orderBy("scheme").as[(String, Long, Long, Long)].collect()
    val two = Shard.reshardStability(ids, "doc_id", 8, 10)
      .orderBy("scheme").as[(String, Long, Long, Long)].collect()
    assert(three.filter(_._1 != "jump").toSeq == two.toSeq)
    val jumpMoved = (0L until 400L).count(k =>
      HashKernels.jumpHash(k, 8) != HashKernels.jumpHash(k, 10))
    val j = three.find(_._1 == "jump").get
    assert(j._2 == 400L && j._3 == jumpMoved.toLong)
    assert(j._4 == jumpMoved.toLong * 1000000L / 400L)
  }

  test("groundednessSweep agrees with groundednessAudit at each fixed n") {
    val ctx = Seq(
      (1L, 10L, "alpha beta gamma delta epsilon zeta"),
      (1L, 20L, "one two three four five"),
      (2L, 10L, "alpha beta gamma delta"))
      .toDF("q_id", "doc_id", "text")
    val answers = Seq(
      (1L, "alpha beta gamma delta nine ten eleven twelve"),
      (2L, "alpha beta gamma delta"),
      (4L, "too short"))
      .toDF("q_id", "answer")
    val sweep = Rag.groundednessSweep(answers, "q_id", "answer",
        ctx, "text", Seq(2, 3, 4, 5))
      .orderBy("n").as[(Long, Long, Long, Long, Long)].collect()
    assert(sweep.map(_._1).toSeq == Seq(2L, 3L, 4L, 5L))
    for (row <- sweep) {
      val n = row._1.toInt
      val per = Rag.groundednessAudit(answers, "q_id", "answer",
          ctx, "doc_id", "text", n)
        .agg(count(lit(1)), sum($"n_spans"), sum($"n_supported"))
        .as[(Long, Long, Long)].head()
      assert(row._2 == per._1, s"n=$n n_answers")
      assert(row._3 == per._2, s"n=$n n_spans")
      assert(row._4 == per._3, s"n=$n n_supported")
      val expPpm = if (row._3 > 0) (row._3 - row._4) * 1000000L / row._3 else 0L
      assert(row._5 == expPpm, s"n=$n ppm")
    }
  }

  test("groundednessSweep: sizes validated, duplicates collapsed") {
    val a = Seq((1L, "x y z")).toDF("q_id", "answer")
    val c = Seq((1L, 1L, "x y z")).toDF("q_id", "doc_id", "text")
    intercept[IllegalArgumentException] {
      Rag.groundednessSweep(a, "q_id", "answer", c, "text", Nil)
    }
    intercept[IllegalArgumentException] {
      Rag.groundednessSweep(a, "q_id", "answer", c, "text", Seq(0))
    }
    val out = Rag.groundednessSweep(a, "q_id", "answer", c, "text",
      Seq(2, 2, 3)).orderBy("n").as[(Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(2L, 3L))
  }
}

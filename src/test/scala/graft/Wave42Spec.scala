package graft

import org.apache.spark.sql.functions._

import graft.ops.{RankEval, Similarity}

/** Wave 42: matryoshka truncation audits. */
class Wave42Spec extends SparkSpec {
  import spark.implicits._

  test("full-dim route compared against itself is 100% contained") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val qs = emb.filter($"vec_id" % 50L === 7L)
      .select($"vec_id".as("q_id"), $"embedding".as("qvec"))
    val a = Similarity.knnJoin(emb, "vec_id", "embedding",
      qs, "q_id", "qvec", 10)
    val out = RankEval.overlapAtK(a, a, "q_id", "vec_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._2 == 10L && r._4 == 10L && r._6 == 1000000L))
  }

  test("a misleading leading dimension makes the prefix route disagree") {
    // vectors whose FIRST coordinate says one thing and whose tail says
    // the opposite: the 1-dim prefix route must rank doc 2 over doc 1
    // while the full route prefers doc 1 - truncation loss is real and
    // the audit must see it
    // (1-dim cosine only sees SIGN, so the misleading coordinate must
    // flip it: doc 1 agrees with the query everywhere but dim 1)
    val emb = Seq(
      (1L, Array(-0.1f, 1.0f, 1.0f, 1.0f)),
      (2L, Array(1.0f, -1.0f, -1.0f, -1.0f)),
      (9L, Array(0.2f, 1.0f, 1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val qs = emb.filter($"vec_id" === 9L)
      .select($"vec_id".as("q_id"), $"embedding".as("qvec"))
    def route(dim: Option[Int]) = {
      def cut(df: org.apache.spark.sql.DataFrame, c: String) =
        dim.fold(df)(d => df.withColumn(c, slice(col(c), 1, d)))
      Similarity.knnJoin(cut(emb, "embedding"), "vec_id", "embedding",
        cut(qs, "qvec"), "q_id", "qvec", 1)
    }
    val full = route(None).select($"vec_id").as[Long].head()
    val pre1 = route(Some(1)).select($"vec_id").as[Long].head()
    assert(full == 1L && pre1 == 2L)
  }

  test("q259 sweep: pooled containment well-formed and bounded") {
    val out = graft.Queries42.q259With(spark, sfDir, 50L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(8L, 16L, 32L))
    for (r <- out) {
      assert(r._2 > 0L && r._3 == r._2 * 10L, s"dim=${r._1}: $r")
      assert(r._4 >= 0L && r._4 <= r._3)
      assert(r._5 == r._4 * 1000000L / r._3)
    }
    // wider prefixes should retain at least as much as the narrowest
    // one on THIS fixture (not a theorem, but a fixture regression pin)
    assert(out.last._5 >= out.head._5)
  }
}

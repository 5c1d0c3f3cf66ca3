package graft

import org.apache.spark.sql.functions._

import graft.expr.HashKernels
import graft.ops.Shard

/** Wave 41: zipf-remapped BM25 correctness target + shard-balance audit. */
class Wave41Spec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("shardBalance ≡ driver histogram of all three assignments") {
    val n = 16
    val ids = 0L until 1000L
    def modShard(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % n
    def rdvShard(id: Long): Long =
      (0 until n).maxBy(s => md5hex(s"$id:$s")).toLong
    val byScheme = Map(
      "mod" -> ids.map(modShard),
      "rendezvous" -> ids.map(rdvShard),
      "jump" -> ids.map(HashKernels.jumpHash(_, n)))
    val expected = byScheme.map { case (scheme, assigned) =>
      val h = assigned.groupBy(identity).view.mapValues(_.size.toLong)
      val (mx, mn) = (h.values.max, h.values.min)
      scheme -> ((h.size.toLong, mn, mx, mx * n * 1000000L / 1000L))
    }
    val got = Shard.shardBalance(
        ids.toDF("doc_id"), "doc_id", n)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("shardBalance: all three schemes balance within a uniform envelope") {
    val out = Shard.shardBalance(
        spark.range(0, 20000).select($"id".as("doc_id")), "doc_id", 64)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length == 3)
    for (r <- out) {
      assert(r._2 == 64L, s"${r._1} left shards empty")
      // 312.5 expected per shard; binomial sigma ~17.6 - generous 5-sigma
      assert(r._5 >= 1000000L && r._5 < 1350000L,
        s"${r._1} peak_ppm=${r._5}")
    }
  }

  test("q256 zipf remap produces a head/tail vocabulary, not the 31-word pool") {
    val d = graft.Queries41.q256With(spark, sfDir, 50L)
    // correctness is oracle-hash-gated; here assert the DISTRIBUTION did
    // what it exists for - the remapped corpus drives a real vocabulary
    val terms = graft.io.Tables.documents(spark, sfDir)
      .select(explode(split(
        graft.Queries41.zipfText(col("doc_id"), col("text")), " "))
        .as("t"))
      .groupBy("t").count()
    val nDistinct = terms.count()
    assert(nDistinct > 1500L, s"distinct=$nDistinct")
    val top = terms.orderBy(desc("count")).limit(1)
      .as[(String, Long)].head()
    val med = terms.agg(expr("percentile_approx(count, 0.5)"))
      .as[Double].head()
    assert(top._2 > 20L * med, s"head=${top} median=$med - no head/tail split")
    assert(d.columns.toSeq ==
      Seq("q_id", "doc_id", "score_e6", "rank"))
  }
}

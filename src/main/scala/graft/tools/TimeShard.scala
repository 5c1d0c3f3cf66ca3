package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the per-row shard-assignment cost at a deploy-scale shard count:
  * `runMain graft.tools.TimeShard <sfDir> <numShards> <reps>` times a
  * count over each assignment spelling (jump kernel, rendezvous md5,
  * rendezvous xxhash64, mod md5) on the documents ids, min-of-reps. */
object TimeShard {
  def main(args: Array[String]): Unit = {
    val (sfDir, n, reps) = (args(0), args(1).toInt, args(2).toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // widen the id frame so per-row cost dominates scheduling overhead
    val ids = graft.io.Tables.documents(spark, sfDir)
      .select(col("doc_id")).crossJoin(
        spark.range(0, 8).select(col("id").as("rep")))
      .select((col("doc_id") * 8L + col("rep")).as("doc_id"))
      .localCheckpoint()
    println(s"[timeshard] rows=${ids.count()} shards=$n")
    def time(name: String, c: org.apache.spark.sql.Column): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        ids.select(c.as("s")).agg(sum(col("s"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeshard] $name%-16s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("jump", graft.ops.Shard.jumpShard(col("doc_id"), n))
    time("rendezvous-md5", graft.ops.Shard.rendezvousShard(col("doc_id"), n))
    time("rendezvous-xx", graft.ops.Shard.rendezvousShardFast(col("doc_id"), n))
    time("mod-md5", pmod(graft.functions.HashFns.md5Long(col("doc_id").cast("string")), lit(n.toLong)))
    spark.stop()
  }
}

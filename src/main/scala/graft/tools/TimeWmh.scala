package graft.tools

import org.apache.spark.sql.SparkSession

import graft.io.Tables
import graft.ops.Dedup

/** A/B timer for the two weighted-MinHash spellings (r17 task: replace the
  * r16 expanded-array banding with narrow (term,k)-pair hashing):
  * `runMain graft.tools.TimeWmh [sfDir] [reps]` times
  * [[graft.ops.Dedup.weightedMinHashLshPairs]] (narrow) and
  * [[graft.ops.Dedup.weightedMinHashLshPairsExpanded]] (r16 array
  * spelling) at q268's parameters in ONE session, interleaved, so ambient
  * drift cancels. Session config matches [[TimeMany]]/[[TimeOne]] and the
  * BENCH_stable pin fixture — local[32], 32 shuffle partitions (NOT
  * [[graft.Bench]]'s `SPARK_GRAFT_CPUS` default of 4); compare against
  * pins and TimeMany numbers, not a 4-CPU sweep. */
object TimeWmh {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.documents(spark, sfDir).count()
    def run(label: String,
        f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = f().count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[wmh] $label rows=$n sec=$sec%.3f")
      sec
    }
    val docs = Tables.documents(spark, sfDir)
    val times = (1 to reps).flatMap { _ =>
      val narrow = run("narrow", () => Dedup.weightedMinHashLshPairs(
        docs, "doc_id", "text", 12, 4, 0.6, 8))
      val array = run("array ", () => Dedup.weightedMinHashLshPairsExpanded(
        docs, "doc_id", "text", 12, 4, 0.6, 8))
      Seq(narrow -> array)
    }
    System.err.println(f"[wmh] min narrow=${times.map(_._1).min}%.3f " +
      f"array=${times.map(_._2).min}%.3f")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("warmup")(spark.range(100).count())
    for (q <- Seq("q14_minhash_lsh", "q16_near_dup_embed", "q31_kmeans", "q13_dedup_exact"))
      time(q)(SparkEntry.queries(q)(spark, dir).count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Batch single-session timer for scaling audits:
  * `runMain graft.tools.TimeMany <sfDir> <reps> <name> [name...]`.
  * Same session config as [[graft.Bench]]; prints per-query min-of-reps.
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[timemany] $name min=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")} sf=$sfDir")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Batch single-session timer for scaling audits:
  * `runMain graft.tools.TimeMany <sfDir> <reps> <name> [name...]`.
  * Session config follows [[graft.Bench]]'s SPARK_GRAFT_CPUS knob but
  * defaults to 32 — the driver's bench invocation — so numbers are
  * comparable to BENCH_full.json without exporting anything.
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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

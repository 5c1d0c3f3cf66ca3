package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B a session-conf hypothesis on named queries:
  * `GRAFT_CONF="spark.sql.adaptive.enabled=false,spark.foo=bar" \
  *   runMain graft.tools.TimeConf <sfDir> <reps> <name> [name...]`.
  * Identical to [[TimeMany]] except the extra confs — so a conf's effect
  * is the diff between a TimeMany and a TimeConf run in the same session
  * weather. Measurement only; Bench never reads GRAFT_CONF. */
object TimeConf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra = sys.env.getOrElse("GRAFT_CONF", "")
      .split(",").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
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
        f"[timeconf] $name min=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")} conf=${extra.map(kv => kv._1 + "=" + kv._2).mkString(";")}")
    }
    spark.stop()
  }
}

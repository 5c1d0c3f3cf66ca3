package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session A/B of RUNTIME confs (the only honest way to compare under
  * ambient drift — alternate A and B reps in one JVM):
  * `GRAFT_CONF="k=v,k2=v2" runMain graft.tools.AbConf <sfDir> <reps> <name>...`
  * For each query: reps runs with the session defaults (A), reps runs with
  * GRAFT_CONF applied (B), interleaved A,B,A,B..; prints min of each arm. */
object AbConf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra = sys.env.getOrElse("GRAFT_CONF", "")
      .split(",").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val saved = extra.map { case (k, _) => k -> spark.conf.getOption(k) }
    def apply(on: Boolean): Unit =
      if (on) extra.foreach { case (k, v) => spark.conf.set(k, v) }
      else saved.foreach { case (k, vOpt) =>
        vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      apply(true); run() // warm both arms once, B first
      apply(false); run()
      val (as, bs) = (1 to reps).map { _ =>
        apply(false); val a = run()
        apply(true); val b = run()
        (a, b)
      }.unzip
      apply(false)
      System.err.println(
        f"[abconf] $name A_min=${as.min}%.3f B_min=${bs.min}%.3f " +
        f"A=${as.map(t => f"$t%.2f").mkString(",")} B=${bs.map(t => f"$t%.2f").mkString(",")} " +
        s"conf=${extra.map(kv => kv._1 + "=" + kv._2).mkString(";")}")
    }
    spark.stop()
  }
}

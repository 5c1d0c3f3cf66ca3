package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The performance row for [[graft.io.Layout.writeBucketed]] (r17 verdict
  * task: the op had a zero-Exchange plan proof in BucketingSpec but no
  * timing): `runMain graft.tools.TimeBucketed <sfDir> <reps> [buckets]`.
  *
  * Measures the co-located-join amortization claim — shuffle once at
  * write, zero at every read — on orders ⋈ lineitem (o_orderkey):
  *
  *  A. plain parquet scans, sort-merge join (both sides exchanged);
  *  B. `spark.table` over the two bucketed tables (zero Exchange);
  *  C. B with `spark.sql.legacy.bucketedTableScan.outputOrdering=true` —
  *     single-file-per-bucket tables (writeBucketed's pre-repartition
  *     guarantees this) report their sortBy order to the planner, which
  *     drops the two residual per-partition Sorts under the SMJ.
  *
  * Broadcast is disabled for all three arms (autoBroadcastJoinThreshold
  * = -1): at fixture scale AQE would broadcast the orders side and bypass
  * the joins being compared; at the 100 TB posture both sides exceed any
  * broadcast threshold, so SMJ-vs-bucketed-SMJ is the honest comparison.
  * The timed action aggregates one column from each side so neither scan
  * prunes away. Interleaved A,B,C reps in one JVM (the AbConf protocol);
  * bucketed tables are written once into a temp warehouse before timing.
  */
object TimeBucketed {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_wh")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val buckets = if (args.length > 2) args(2).toInt else cpus.toInt
    val li = graft.io.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val ord = graft.io.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    graft.io.Layout.writeBucketed(li, "li_b", "l_orderkey", buckets)
    graft.io.Layout.writeBucketed(
      ord.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b",
      "l_orderkey", buckets)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def joined(l: org.apache.spark.sql.DataFrame,
        o: org.apache.spark.sql.DataFrame): Long =
      l.join(o, Seq("l_orderkey"))
        .agg(sum(col("l_extendedprice")), sum(col("o_totalprice")), count(lit(1)))
        .collect().head.getLong(2)
    def armA(): Long = joined(li,
      ord.withColumnRenamed("o_orderkey", "l_orderkey"))
    def armB(): Long = joined(spark.table("li_b"), spark.table("ord_b"))
    def withFlag[T](on: Boolean)(f: => T): T = {
      val k = "spark.sql.legacy.bucketedTableScan.outputOrdering"
      spark.conf.set(k, on.toString)
      try f finally spark.conf.set(k, "false")
    }
    // warm all arms once (codegen + file listing), then interleave
    armA(); armB(); withFlag(true)(armB())
    val runs = (1 to reps).map { _ =>
      val (ta, na) = time(armA())
      val (tb, nb) = time(armB())
      val (tc, nc) = time(withFlag(true)(armB()))
      require(na == nb && nb == nc, s"row counts diverged: $na $nb $nc")
      (ta, tb, tc)
    }
    val exA = { val df = li.join(ord.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey")).groupBy().count()
      df.queryExecution.executedPlan.toString }
    System.err.println(
      f"[timebucketed] rows=${armA()} buckets=$buckets " +
      f"parquetSMJ_min=${runs.map(_._1).min}%.3f " +
      f"bucketed_min=${runs.map(_._2).min}%.3f " +
      f"bucketedSorted_min=${runs.map(_._3).min}%.3f " +
      s"runsA=${runs.map(r => f"${r._1}%.2f").mkString(",")} " +
      s"runsB=${runs.map(r => f"${r._2}%.2f").mkString(",")} " +
      s"runsC=${runs.map(r => f"${r._3}%.2f").mkString(",")}")
    // plan evidence: exchanges and sorts per arm
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    def shape(tag: String, p: String): Unit =
      System.err.println(s"[timebucketed] $tag exchanges=" +
        "Exchange hashpartitioning".r.findAllIn(p).size +
        " sorts=" + "\\bSort \\[".r.findAllIn(p).size)
    shape("parquetSMJ",
      planOf(li.join(ord.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey")).agg(count(lit(1)))))
    shape("bucketed",
      planOf(spark.table("li_b").join(spark.table("ord_b"),
        Seq("l_orderkey")).agg(count(lit(1)))))
    withFlag(true) {
      shape("bucketedSorted",
        planOf(spark.table("li_b").join(spark.table("ord_b"),
          Seq("l_orderkey")).agg(count(lit(1)))))
    }
    spark.stop()
  }
}

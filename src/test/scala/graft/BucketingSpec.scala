package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketed tables: the co-located-join story for the 100 TB posture.
  * Writing both fact tables bucketed by the join key means every future
  * join/aggregation on that key reads pre-partitioned data — NO Exchange
  * in the plan, which at scale is the difference between a network-bound
  * job and a local one. (The fixture loaders read plain parquet; bucketing
  * is the warehouse-managed layout a deployment would choose.) */
class BucketingSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("join of two tables bucketed on the key runs with zero Exchange") {
    val db = "graft_bucket_test"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    try {
      // through the op (r17): its pre-repartition by the bucket
      // expression is what bounds the layout at ONE file per bucket —
      // bare bucketBy writes one file per (task, bucket) pair
      graft.io.Layout.writeBucketed(graft.io.Tables.orders(spark, sfDir),
        s"$db.orders_b", "o_orderkey", 8)
      graft.io.Layout.writeBucketed(graft.io.Tables.lineitem(spark, sfDir),
        s"$db.lineitem_b", "l_orderkey", 8)
      val tableDir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        s"$db.db/orders_b")
      val bucketFiles = tableDir.listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(bucketFiles.length == 8,
        s"one file per bucket expected: ${bucketFiles.map(_.getName).toSeq}")

      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev_c"))

      val p = plan(joined)
      // bucket layout satisfies the join's distribution requirement on BOTH
      // sides and the aggregation's on the status regroup only
      assert("""[+:]- Exchange hashpartitioning\((l|o)_orderkey""".r
        .findAllIn(p).isEmpty, p)
      assert(joined.count() > 0)

      // the same join over the raw parquet shuffles both sides — the
      // baseline the bucketed layout removes
      val raw = graft.io.Tables.lineitem(spark, sfDir)
        .join(graft.io.Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
      val rawPlan = plan(raw)
      assert(rawPlan.contains("Exchange") || rawPlan.contains("BroadcastExchange"), rawPlan)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}

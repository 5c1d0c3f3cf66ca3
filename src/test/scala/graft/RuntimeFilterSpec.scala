package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Runtime filtering — the two Catalyst features that keep a selective
  * dim⋈fact join from scanning the whole fact table at 100 TB:
  * dynamic partition pruning (partition list decided at runtime from the
  * dim side) and the runtime bloom-filter join (row-level prefilter pushed
  * to the fact scan). Both rules match a *selective filter over a scan* on
  * the creation side — aggregates or constant-foldable predicates there
  * silently disable them, which is exactly why this spec pins the shape. */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partition pruning fires on a source-partitioned fact table") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    graft.io.Tables.documents(spark, sfDir)
      .write.partitionBy("source").mode("overwrite").parquet(s"$dir/docs")
    val fact = spark.read.parquet(s"$dir/docs")
    // dim table persisted with a REAL attribute to filter on (a literal
    // lit(true) column folds away and defeats the pruning rule)
    graft.io.Tables.documents(spark, sfDir)
      .select($"source").distinct()
      .withColumn("tier",
        when(substring($"source", -1, 1).isin("0", "1"), "hot").otherwise("cold"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim").filter($"tier" === "hot")
    val joined = fact.join(dim, Seq("source"))
    val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.toLowerCase.contains("dynamicpruning"), p)
    assert(joined.count() > 0)
  }

  test("AQE splits a skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // keep it a sort-merge join
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~100x the rows of every other key
      val skewed = spark.range(20000)
        .select(when($"id" < 19000, lit(7L)).otherwise($"id" % 64).as("k"),
          concat(lit("payload-payload-payload-"), $"id").as("v"))
      val dim = spark.range(64).select($"id".as("k"), concat(lit("d"), $"id").as("d"))
      val joined = skewed.join(dim, Seq("k"))
      // collect() (not count()) so THIS queryExecution runs and AQE
      // finalizes its adaptive plan
      assert(joined.collect().length == 20000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter reaches the probe-side scan of a shuffle join") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val events = graft.io.Tables.events(spark, sfDir)
      // selective filter directly over the scan — no aggregate in between
      val hot = events.filter($"event_type" === "purchase")
        .select($"user_id".as("hot_user"), $"event_id".as("hot_event"))
      val joined = events.join(hot, $"user_id" === $"hot_user")
      // the injected filter renders as might_contain(bloom_filter_agg(...))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), p)
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Fixture/warehouse table loaders.
  *
  * The reference re-reads CSV with `inferSchema=True` at every one of its 9
  * scan sites (reference: REDDIT-jointure.py:39,55 et al.), paying a double
  * scan and risking type drift. Here every hand-off is Parquet (embedded
  * schema, column pruning + predicate pushdown reach the scan), which is the
  * design fix SURVEY.md §4.1 calls for.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table from `dir` (e.g. /root/testdata/sf0.01). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** The events fixture stores TIMESTAMP(NANOS) parquet, which Spark 4's
    * schema INFERENCE rejects by default (PARQUET_TYPE_ILLEGAL). Rather than
    * flipping `spark.sql.legacy.parquet.nanosAsLong` — a session-wide conf a
    * reader helper must not leak into a concurrent session — we declare the
    * schema with `ts: LONG` up front: with a user-provided schema no
    * inference runs, the vectorized reader loads the INT64 nanos column
    * verbatim, and no conf is touched. The long is then converted to a
    * microsecond TIMESTAMP with integer floor division, matching DuckDB's
    * epoch_us() truncation exactly. */
  val eventsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

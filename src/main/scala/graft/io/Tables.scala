package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

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
  /** The events fixture stores TIMESTAMP(NANOS) parquet, which Spark 4
    * rejects by default (PARQUET_TYPE_ILLEGAL). We read nanos as long
    * (spark.sql.legacy.parquet.nanosAsLong — set here, scoped to the
    * session) and convert to a microsecond TIMESTAMP with integer floor
    * division, matching DuckDB's epoch_us() truncation exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

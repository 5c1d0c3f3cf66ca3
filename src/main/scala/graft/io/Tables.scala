package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{concat, expr, lit, raise_error, timestamp_micros, when}

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
  /** The events fixture has shipped with two distinct `ts` physical types
    * across fixture generations: TIMESTAMP(MICROS) (which Spark reads
    * natively) and TIMESTAMP(NANOS) (which Spark 4's schema inference
    * rejects by default — PARQUET_TYPE_ILLEGAL). A loader that bakes in
    * either generation's quirk silently corrupts the other — a `div 1000`
    * applied to micros compresses all event time 1000×. So: try plain
    * inference first and branch on the ACTUAL footer type; only when
    * inference itself rejects the file (the nanos generation) fall back to
    * a declared `ts: LONG` schema — with a user-provided schema no
    * inference runs, the vectorized reader loads the INT64 nanos verbatim,
    * and no session-wide conf (`spark.sql.legacy.parquet.nanosAsLong`) is
    * touched. The nanos long is floor-divided to microseconds, matching
    * DuckDB's epoch_us() truncation exactly. */
  val eventsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** Normalize a loaded events frame's `ts` to TimestampType, whatever the
    * footer declared. TimestampNTZ (tz-naive micros, isAdjustedToUTC=false)
    * casts value-identically because every graft session pins
    * session.timeZone=UTC; a raw INT64 column (no logical annotation) is
    * interpreted by MAGNITUDE, not assumption — nanos is the only raw-long
    * generation observed, but a future raw micros/millis generation
    * silently scaled 1000× wrong is exactly the failure class this loader
    * exists to prevent, so anything below the epoch-nanos range fails
    * loudly per row instead of guessing a divisor. */
  private def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType => df.withColumn("ts", rawLongTsToMicros)
      case other => throw new IllegalStateException(
        s"events fixture has unsupported ts type $other")
    }
  }

  /** Raw INT64 → timestamp, with the magnitude plausibility gate: epoch
    * NANOS for any plausible event date is ≥ ~1.5e18 while epoch micros
    * tops out ~7e15 for this century — three orders of magnitude apart, so
    * 1e17 separates them unambiguously. The branch is a codegen'd integer
    * compare (no extra probe job); an implausible value raises with the
    * offending long in the message. */
  private def rawLongTsToMicros: org.apache.spark.sql.Column =
    when(expr("ts") >= 100000000000000000L,
      timestamp_micros(expr("ts div 1000")))
      .otherwise(timestamp_micros(raise_error(concat(
        lit("events.ts raw INT64 value "), expr("CAST(ts AS STRING)"),
        lit(" is below the epoch-nanos range — a micros/millis raw " +
          "generation needs an explicit divisor, refusing to guess")))
        .cast(org.apache.spark.sql.types.LongType)))

  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // catch ONLY the schema-inference rejection (the TIMESTAMP(NANOS)
    // generation, Spark 4's PARQUET_TYPE_ILLEGAL AnalysisException) — a
    // missing file, corrupt footer, or I/O error must surface as itself,
    // not be masked by a declared-schema reread with a nanos divisor
    try normalizeEventsTs(spark.read.parquet(path))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(_.contains("PARQUET_TYPE_ILLEGAL"))
            || e.getMessage.contains("Illegal Parquet type") =>
        spark.read.schema(eventsSchema).parquet(path)
          .withColumn("ts", rawLongTsToMicros)
    }
  }

  /** Streaming variant of [[events]] over a DIRECTORY of events parquet:
    * `readStream` demands a user-supplied schema, so the footer is probed
    * with a one-off batch read (driver-side metadata only), then the same
    * type-branching as the batch loader applies — the streaming path must
    * never re-hardcode one fixture generation's timestamp unit. */
  def eventsStream(spark: SparkSession, path: String): DataFrame =
    try normalizeEventsTs(
      spark.readStream.schema(spark.read.parquet(path).schema).parquet(path))
    catch {
      // same narrow catch as the batch loader: only the nanos-generation
      // inference rejection falls back to the declared INT64 schema
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(_.contains("PARQUET_TYPE_ILLEGAL"))
            || e.getMessage.contains("Illegal Parquet type") =>
        spark.readStream.schema(eventsSchema).parquet(path)
          .withColumn("ts", rawLongTsToMicros)
    }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

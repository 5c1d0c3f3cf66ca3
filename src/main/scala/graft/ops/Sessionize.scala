package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — a training-data /
  * clickstream extension operator (no reference counterpart; the reference
  * has no time-series processing at all, SURVEY.md §2.9).
  *
  * Classic lag + running-sum formulation: one shuffle on the user key; both
  * windows share the same partitioning so Catalyst plans a single Exchange.
  * All timestamps are compared as epoch microseconds (integer arithmetic —
  * deterministic and engine-portable).
  */
object Sessionize {

  /** Assign `session_idx` (0-based per user) using a `gapMinutes` idle
    * timeout. `tieCol` must make (user, ts, tie) unique for determinism. */
  def sessions(df: DataFrame, userCol: String, tsCol: String, tieCol: String,
      gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val gapUs = gapMinutes * 60L * 1000000L
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || us - prev > gapUs, 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_idx",
        (sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1).cast("long"))
      .drop("__new")
  }

  /** Per-session stats: event count, start/end (epoch µs), value sum scaled
    * to integer 1e-4 units so the sum is order-independent (exact long
    * arithmetic — float summation order would be nondeterministic). */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String, tieCol: String,
      valueCol: String, gapMinutes: Int): DataFrame =
    sessions(df, userCol, tsCol, tieCol, gapMinutes)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        sum(round(col(valueCol) * 10000).cast("long")).as("value_e4"))
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators (north-star extension — the reference has
  * no streaming at all, SURVEY.md §2.9; the `events` fixture supplies the
  * event-time data).
  *
  * Each transform takes a DataFrame and works identically on a batch frame
  * and a `readStream` frame — the standard Structured Streaming contract.
  * `withWatermark` is a no-op in batch, so the SAME code is
  * oracle-checkable in batch and incrementally correct in streaming.
  */
object Stream {

  /** Tumbling-window per-type aggregation with a watermark: event count and
    * an exact integer-scaled value sum (order-independent long arithmetic,
    * not float). Window start is emitted as epoch µs for engine-portable
    * comparison. */
  def windowedTypeCounts(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String, windowDur: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(typeCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col(valueCol) * 10000).cast("long")).as("value_e4"))
      .select(
        unix_micros(col("window.start")).as("win_start_us"),
        col(typeCol), col("n_events"), col("value_e4"))

  /** Sliding-window variant (windowDur every slideDur). */
  def slidingTypeCounts(events: DataFrame, tsCol: String, typeCol: String,
      windowDur: String, slideDur: String, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur, slideDur), col(typeCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("window.start")).as("win_start_us"),
        unix_micros(col("window.end")).as("win_end_us"),
        col(typeCol), col("n_events"))

  /** Gap-based sessions via the NATIVE `session_window` operator — the
    * streaming-correct form of [[graft.ops.Sessionize]] (which is the
    * batch/oracle formulation): state is kept per open session and evicted
    * by the watermark, so unbounded streams run in bounded memory. Window
    * end = last event + gap by session_window semantics. */
  def sessionWindowStats(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gap: String, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col(valueCol) * 10000).cast("long")).as("value_e4"))
      .select(
        col(userCol),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("value_e4"))

  /** Streaming exact dedup: drop duplicate keys with watermark-bounded
    * state (`dropDuplicatesWithinWatermark`), the streaming face of
    * [[graft.ops.Dedup.exactGroups]] — state holds only keys younger than
    * the watermark, so it cannot grow without bound. */
  def dedupKeyed(events: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics over an ordered event log: the Markov
  * transition matrix between event types and last-touch conversion
  * attribution. Both order events by (ts, tieCol) within the user —
  * the engine-deterministic total order every windowed query in this
  * repo uses — and report rates as integer ppm.
  */
object Journey {

  /** First-order Markov transition counts and row-normalized
    * probabilities between consecutive event types of the same user.
    *
    * Output: (prev_type, next_type, n, p_ppm), p normalized over each
    * prev_type row (Σ_next p = 1e6 up to flooring).
    *
    * Scale shape: ONE window pass partitioned by user (the event log's
    * natural key — no global sort), then a |types|² aggregate; the
    * row-total is a second tiny window over the counts frame, not a
    * rescan of the log. */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val counts = events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy(col("prev_type"))
    counts
      .withColumn("__tot", sum(col("n")).over(rowTotal))
      .withColumn("p_ppm", expr("n * 1000000L div __tot"))
      .drop("__tot")
  }

  /** Last-touch attribution: each conversion event's value is credited
    * to the user's most recent PRECEDING non-conversion event type; a
    * conversion with no prior touch lands in the "(direct)" channel.
    *
    * Output: (channel, n_conversions, attributed_e4) — value summed in
    * integer 1e-4 units (the q27 convention).
    *
    * Scale shape: one running `last(ignoreNulls)` window per user over
    * the strictly-preceding frame, then a |types|-row aggregate. No
    * self-join of the log against itself. */
  def lastTouchAttribution(events: DataFrame, userCol: String,
      tsCol: String, tieCol: String, typeCol: String, valueCol: String,
      convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("__touch", last(
        when(col(typeCol) =!= convType, col(typeCol)),
        ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .groupBy(coalesce(col("__touch"), lit("(direct)")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(round(col(valueCol) * 10000).cast("long")).as("attributed_e4"))
  }

  /** Linear multi-touch attribution with a lookback deadline: each
    * conversion's value is split EQUALLY across the distinct
    * non-conversion event types the user produced in the `lookbackSec`
    * window strictly before it ((ts, tie) total order); conversions with
    * no in-window touch credit "(direct)" in full. Weights are integer:
    * each channel gets `value_e4 · (1e6 div n_channels) div 1e6`, so the
    * credited total is exactly reconstructible (flooring documented, not
    * hidden in float splits).
    *
    * Output: (channel, n_credits, credit_e4). Scale shape: the q204
    * funnel class — one user-keyed equi-join with the time band as a
    * residual, collapsed to DISTINCT (conversion, channel) before any
    * counting; the lookback bounds per-user pair work.
    *
    * A conversion's identity is the COMPOSITE (user, tieCol) everywhere
    * (distinct, channel-count window, direct anti-join) — `tieCol` only
    * has to be unique WITHIN a user, the same contract the (ts, tie)
    * window ordering of [[transitionMatrix]] and its siblings assume. A
    * merely per-user-unique tie value never merges two users'
    * conversions. */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, valueCol: String, convType: String,
      lookbackSec: Long): DataFrame = {
    require(lookbackSec >= 1)
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(tieCol).as("__cid"),
        unix_micros(col(tsCol)).as("__ct"),
        round(col(valueCol) * 10000).cast("long").as("__v"))
    val touch = events.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("__u"), col(typeCol).as("channel"),
        unix_micros(col(tsCol)).as("__tt"), col(tieCol).as("__tid"))
    val pairs = conv.join(touch, Seq("__u"))
      .filter(col("__tt") < col("__ct") ||
        (col("__tt") === col("__ct") && col("__tid") < col("__cid")))
      .filter(col("__tt") >= col("__ct") - lit(lookbackSec * 1000000L))
      .select(col("__u"), col("__cid"), col("__v"), col("channel"))
      .distinct()
    val credited = pairs
      .withColumn("__nch", count(lit(1)).over(
        Window.partitionBy(col("__u"), col("__cid"))))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        sum(expr("__v * (1000000L div __nch) div 1000000L"))
          .as("credit_e4"))
    val direct = conv.join(pairs.select("__u", "__cid").distinct(),
        Seq("__u", "__cid"), "left_anti")
      .agg(count(lit(1)).as("n_credits"), sum(col("__v")).as("credit_e4"))
      .select(lit("(direct)").as("channel"), col("n_credits"),
        coalesce(col("credit_e4"), lit(0L)).as("credit_e4"))
      .filter(col("n_credits") > 0L)
    credited.unionByName(direct)
  }

  /** Session entry paths: the first `depth` event types of each session
    * (q28's 30-min-gap sessions), joined with '>' — which openings lead
    * sessions. Bounding the path to a fixed prefix is what keeps the
    * output space |types|^depth, not |sessions|.
    *
    * Output: (path, n_sessions, n_users). Scale shape: the q28 session
    * window (user-keyed), a row_number prune to `depth` rows per
    * session, and a sorted-collect per session (the A1 discipline —
    * order pinned by (ts, tie), never collect-order luck). */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, gapMinutes: Int,
      depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 16)
    val s = Sessionize.sessions(events, userCol, tsCol, tieCol, gapMinutes)
    val w = Window.partitionBy(col(userCol), col("session_idx"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    s.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= depth)
      .groupBy(col(userCol), col("session_idx"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn"), col(typeCol).as("t")))),
        x => x("t")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col(userCol)).as("n_users"))
  }

  /** Half-life-decayed engagement score: each event contributes its
    * integer 1e-4 value floored through `age_weeks div halfLifeWeeks`
    * halvings relative to the corpus' last observed day — a power-of-two
    * decay (integer shift, exact in both engines) instead of the usual
    * float exp().
    *
    * Output: (userCol, n_events, raw_e4, decayed_e4). Scale shape: the
    * reference day is a 1-row cross join (the q90 scalar class); the
    * rest is one user-keyed aggregate. The projected base frame is
    * lazily checkpointed — it feeds both the reference-day aggregate and
    * the main rollup, and Catalyst shares no subtrees across join
    * branches (the [[Dedup]] checkpoint-lifetime convention), so without
    * it the events scan + unix_micros/round projection would run twice. */
  def decayScore(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, halfLifeWeeks: Int): DataFrame = {
    require(halfLifeWeeks >= 1)
    val dayUs = 86400000000L
    val day = expr(s"unix_micros($tsCol) div ${dayUs}L")
    val base = events.select(col(userCol), day.as("__d"),
        round(col(valueCol) * 10000).cast("long").as("__v"))
      .localCheckpoint(false)
    base.crossJoin(base.agg(max(col("__d")).as("__ref")))
      .withColumn("__h",
        least(expr(s"(__ref - __d) div 7L div ${halfLifeWeeks}L"), lit(62L)))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__v")).as("raw_e4"),
        sum(expr("__v div shiftleft(1L, cast(__h as int))"))
          .as("decayed_e4"))
  }

  /** Inter-event interval distribution for one event type: per-user
    * consecutive gaps ((ts, tie) order), summarized per a grouping of
    * the gap in whole days — the purchase-cadence readout (and, on an
    * ingest log, the crawl-revisit cadence).
    *
    * Output: (gap_days, n_intervals, n_users) sorted by gap. Scale
    * shape: one user-keyed window pass over the filtered type, then a
    * |distinct gaps|-row aggregate. */
  def interEventIntervals(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, eventType: String): DataFrame = {
    val dayUs = 86400000000L
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    events.filter(col(typeCol) === eventType)
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("gap_days",
        expr(s"(unix_micros($tsCol) - __prev) div ${dayUs}L"))
      .groupBy(col("gap_days"))
      .agg(count(lit(1)).as("n_intervals"),
        countDistinct(col(userCol)).as("n_users"))
  }

  /** Out-of-order arrival profile: how late events arrive relative to
    * the order they were ingested in (`seqCol`, e.g. a monotone event
    * id) vs the order they HAPPENED in (`tsCol`) — per event type, the
    * share of events arriving behind an already-ingested later event and
    * the max/mean lateness in seconds. THE input for choosing a
    * streaming watermark delay: a watermark below the observed lateness
    * tail silently drops those events.
    *
    * Lateness of an event = running max of event time over everything
    * ingested before it (per type, `seqCol` order) minus its own event
    * time, floored at 0. Output: (type, n, late_ppm, max_late_s,
    * sum_late_s). Scale shape: one type-keyed window pass. */
  def latenessProfile(events: DataFrame, typeCol: String, tsCol: String,
      seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(typeCol)).orderBy(col(seqCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("__hwm", max(unix_micros(col(tsCol))).over(w))
      .withColumn("__late",
        greatest(coalesce(col("__hwm") - unix_micros(col(tsCol)), lit(0L)),
          lit(0L)))
      .groupBy(col(typeCol).as("type"))
      .agg(count(lit(1)).as("n"),
        expr("sum(case when __late > 0 then 1L else 0L end) " +
          "* 1000000L div count(1)").as("late_ppm"),
        expr("max(__late) div 1000000L").as("max_late_s"),
        expr("sum(__late) div 1000000L").as("sum_late_s"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log time-series analytics the monitoring side of a data
  * platform runs — cohort retention and gap-filled series — spelled
  * integer-exact on absolute day indexes (`epoch_us div 86_400_000_000`,
  * no calendar/timezone arithmetic to disagree on).
  */
object Series {

  private val DayUs = 86400000000L

  /** Classic weekly cohort-retention matrix: users grouped by FIRST-SEEN
    * week (absolute day index div 7), each cohort's share of users still
    * active k weeks later. THE product-health readout of an event
    * pipeline; here it doubles as an ingest-health audit (a cohort whose
    * retention cliff-drops marks a collection change).
    *
    * Output: (cohort_week, offset_weeks, n_active, cohort_size,
    * retention_ppm), offset 0 always present at 1e6.
    *
    * Scale shape: first-seen is one map-combined min; activity collapses
    * to DISTINCT (user, week) before the join; the matrix is
    * |cohorts|·|weeks| rows. */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val weeks = events.select(col(userCol).as("__u"),
        expr(s"unix_micros($tsCol) div ${DayUs}L div 7L").as("__w"))
      .distinct()
    val first = weeks.groupBy(col("__u")).agg(min(col("__w")).as("__cw"))
    val size = first.groupBy(col("__cw")).agg(count(lit(1)).as("cohort_size"))
    weeks.join(first, Seq("__u"))
      .groupBy(col("__cw").as("cohort_week"),
        (col("__w") - col("__cw")).as("offset_weeks"))
      .agg(count(lit(1)).as("n_active"))
      .join(size.select(col("__cw").as("cohort_week"), col("cohort_size")),
        Seq("cohort_week"))
      .withColumn("retention_ppm",
        expr("n_active * 1000000L div cohort_size"))
  }

  /** Deadline-bounded funnel conversion: for each configured step pair
    * (a → b), the share of a-events followed by a b-event FROM THE SAME
    * USER within `windowSec` — the product-funnel readout with a clock
    * on it (q68's quality funnel has no deadline; q57's interval join is
    * the mechanism, this is the metric).
    *
    * Output: (step_a, step_b, n_src, n_conv, conversion_ppm), one row
    * per configured pair. Scale shape: the source side joins the pair
    * list (broadcast literal), conversion is ONE left-semi join keyed on
    * the user with the time band as a residual condition — per-user
    * event groups meet, never the full event crossproduct. */
  def funnelConversion(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, pairs: Seq[(String, String)],
      windowSec: Long): DataFrame = {
    require(pairs.nonEmpty && windowSec >= 1)
    val spark = events.sparkSession
    import spark.implicits._
    val pdf = pairs.toDF("step_a", "step_b")
    val src = events
      .select(col(userCol).as("__u"), col(idCol).as("__eid"),
        col(typeCol).as("step_a"),
        expr(s"unix_micros($tsCol)").as("__t0"))
      .join(broadcast(pdf), Seq("step_a"))
    val tgt = events.select(col(userCol).as("__u"),
      col(typeCol).as("step_b"), expr(s"unix_micros($tsCol)").as("__t1"))
    val conv = src.join(tgt,
        src("__u") === tgt("__u") && src("step_b") === tgt("step_b") &&
          col("__t1") > col("__t0") &&
          col("__t1") <= col("__t0") + windowSec * 1000000L,
        "left_semi")
      .groupBy(col("step_a"), col("step_b"))
      .agg(count(lit(1)).as("n_conv"))
    src.groupBy(col("step_a"), col("step_b"))
      .agg(count(lit(1)).as("n_src"))
      .join(conv, Seq("step_a", "step_b"), "left")
      .select(col("step_a"), col("step_b"), col("n_src"),
        coalesce(col("n_conv"), lit(0L)).as("n_conv"))
      .withColumn("conversion_ppm", expr("n_conv * 1000000L div n_src"))
  }

  /** Gap-filled daily value series with last-observation-carried-forward:
    * per group, one row per day of the group's observed span; days with
    * no events carry the previous observed value (leading gaps stay
    * NULL — fabricating a value before the first observation would be
    * lying). The q70 zero-fill resample's imputation sibling.
    *
    * Output: (groupCol, day, value_e4, filled). `value_e4` is the
    * integer-exact `Σ round(value·1e4)` daily sum (the q27 convention).
    *
    * Scale shape: one (group, day) aggregate, a per-group `sequence`
    * grid, and one running `last(ignoreNulls)` window bounded by the
    * group's day span. */
  def forwardFillDaily(events: DataFrame, groupCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val day = expr(s"unix_micros($tsCol) div ${DayUs}L")
    val daily = events.select(col(groupCol), day.as("day"),
        round(col(valueCol) * 10000).cast("long").as("__v"))
      .groupBy(col(groupCol), col("day")).agg(sum(col("__v")).as("__s"))
    val grid = daily.groupBy(col(groupCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(groupCol),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(groupCol, "day"), "left")
      .withColumn("value_e4", last(col("__s"), ignoreNulls = true).over(w))
      .withColumn("filled", col("__s").isNull && col("value_e4").isNotNull)
      .select(col(groupCol), col("day"), col("value_e4"), col("filled"))
  }

  /** Weekday seasonality profile: per (group, weekday 0–6 with 0 =
    * Thursday — absolute day index mod 7, epoch day 0 was a Thursday; no
    * calendar/timezone arithmetic to disagree on), the MEDIAN of the
    * group's daily event counts on that weekday, plus each weekday's
    * lift vs the group's all-week median in ppm. The seasonal baseline a
    * burst detector (q192's class) should normalize against before
    * flagging "unusual" Mondays.
    *
    * Medians are exact lower-median picks over integer daily counts
    * (value-sorted, both engines agree); output is
    * (groupCol, weekday, n_days, median_daily, lift_ppm).
    *
    * Scale shape: the corpus rolls up to one (group, day) count frame;
    * everything after runs on |groups|·|days| rows. */
  def weekdayProfile(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val daily = events.select(col(groupCol),
        expr(s"unix_micros($tsCol) div ${DayUs}L").as("day"))
      .groupBy(col(groupCol), col("day"))
      .agg(count(lit(1)).as("__c"))
    // exact lower median: element at 1-based index (n-1) div 2 + 1 of the
    // value-sorted daily counts (both engines sort longs identically)
    val byWd = daily
      .withColumn("weekday", expr("day % 7L"))
      .groupBy(col(groupCol), col("weekday"))
      .agg(count(lit(1)).as("n_days"),
        expr("element_at(sort_array(collect_list(__c)), " +
          "cast((count(1) - 1) div 2 + 1 as int))").as("median_daily"))
    val overall = daily.groupBy(col(groupCol))
      .agg(expr("element_at(sort_array(collect_list(__c)), " +
        "cast((count(1) - 1) div 2 + 1 as int))").as("__allmed"))
    byWd.join(overall, Seq(groupCol))
      .withColumn("lift_ppm", expr("median_daily * 1000000L div __allmed"))
      .select(col(groupCol), col("weekday"), col("n_days"),
        col("median_daily"), col("lift_ppm"))
  }
}

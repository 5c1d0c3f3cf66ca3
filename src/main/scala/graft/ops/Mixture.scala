package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data MIXTURE construction — the step between a cleaned corpus
  * and a pretraining run: decide how many tokens of each stratum
  * (language, source, quality band) the final mix contains, and up/down
  * sample strata to hit target weights. The reference stops at a cleaned
  * merged table; these are the corpus-to-training-mix operators a 100 TB
  * pipeline needs next (they compose downstream of [[Dedup]]/[[Chunk]]).
  *
  * Everything is RNG-free: selection order and fractional draws come from
  * md5 of the id (the [[graft.Queries4.q56HashSample]] convention), so the
  * same rows are chosen on every engine, on every rerun, forever —
  * resumable at scale and hash-checkable against the DuckDB oracle.
  */
object Mixture {

  /** Deterministic hash order used for all sampling decisions. */
  private def hashOrder(idCol: String): Seq[Column] =
    Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc)

  /** Per-stratum token-budget sample: walk each stratum in md5-hash order
    * and keep rows while the running token total stays within `budget`
    * (inclusive; the first over-budget row and everything after it is
    * dropped). Emits `cum_tokens` so budget accounting is visible
    * downstream.
    *
    * Scale shape: one shuffle on the stratum key; the cumsum window is a
    * single per-stratum pass. A stratum far larger than the budget is the
    * common case (that is why one samples) — at extreme skew, first bound
    * the stratum by an md5-prefix range estimated from a sample (the q56
    * filter pushes to the scan), then run the exact cumsum on the bounded
    * slice; the semantics below are unchanged by that refinement because
    * the hash order is identical.
    */
  def tokenBudgetSample(df: DataFrame, strataCol: String, idCol: String,
      tokenCount: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashOrder(idCol): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokenCount).over(w).cast("long"))
      .filter(col("cum_tokens") <= budget)
  }

  /** Deterministic weighted repetition (mixture epochs): every row of
    * stratum s appears `floor(w_s)` times, plus once more for the
    * `frac(w_s)` fraction of rows whose md5-derived uniform draw falls
    * below the fraction — so a 2.5-weighted stratum is seen 2.5 times per
    * epoch in expectation (exactly 2 or 3 per row, deterministically), and
    * a 0.25 weight DOWN-samples to a quarter. `copy` numbers the
    * repetitions (1-based); rows from weight-0 strata vanish.
    *
    * The fractional draw is the first 4 hex digits of md5 of the SALTED id
    * (`id || ":draw"`) scaled to [0,1) — coarse (2^16 buckets) but
    * engine-portable, and independent of [[tokenBudgetSample]]'s selection
    * order BY CONSTRUCTION: that order is ascending md5 of the unsalted
    * id, so drawing from the same digest would hand budget-sample
    * survivors systematically small draws and silently inflate fractional
    * weights when the two ops compose (a 1%-sampled stratum at w=1.5
    * would repeat ~100% of survivors instead of ~50%).
    *
    * Scale shape: pure map-side (project + explode), no shuffle; output
    * size is Σ w_s · |s|, which is the point.
    */
  def repeatWeighted(df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val draw =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":draw"))), 1, 4), 16, 10)
        .cast("long") / lit(65536.0)
    val copies = (floor(w).cast("long") +
      when(draw < w - floor(w), lit(1L)).otherwise(lit(0L))).as("__copies")
    df.withColumn("__copies", copies)
      .withColumn("copy",
        explode(when(col("__copies") >= 1,
          sequence(lit(1L), col("__copies")))
          .otherwise(array().cast("array<bigint>"))))
      .drop("__copies")
  }
}

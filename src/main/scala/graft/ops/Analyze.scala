package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table statistics — the per-column profile a cost-based
  * optimizer (and a data-quality review) reads: row count, null count,
  * exact distinct count, min/max. ONE corpus scan computes every
  * column's stats as one wide aggregate row; the tall reshape is a
  * zero-shuffle `stack` over that single row.
  */
object Analyze {

  /** Profile `longCols` (rendered via BIGINT, so min/max order and
    * rendering are engine-identical) and `strCols` (lexicographic
    * min/max). Doubles should be integerized by the caller first — their
    * string rendering differs across engines.
    *
    * Output: (column, n_rows, n_nulls, n_distinct, min_str, max_str),
    * one row per profiled column.
    *
    * Shape: one SLIM aggregation per column over a single-column
    * (pruned) scan — two-phase (value-grouped partial counts, then a
    * ≤|distinct|-row rollup), never the multi-countDistinct Expand plan
    * (which replicates every input row |cols|+1 times: the first
    * spelling here measured 12.4 s vs 1.5 s on the 6M-row fixture).
    * Column branches are independent jobs; at 100 TB swap the exact
    * distinct for approx_count_distinct per column — same plan shape. */
  def columnProfile(df: DataFrame, longCols: Seq[String],
      strCols: Seq[String]): DataFrame = {
    require(longCols.nonEmpty || strCols.nonEmpty)
    def profile(c: String, asLong: Boolean): DataFrame = {
      val v = if (asLong) col(c).cast("long") else col(c)
      df.select(v.as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c")).as("n_rows"),
          sum(when(col("__v").isNull, col("__c")).otherwise(0L))
            .as("n_nulls"),
          sum(when(col("__v").isNotNull, 1L).otherwise(0L))
            .as("n_distinct"),
          min(col("__v")).cast("string").as("min_str"),
          max(col("__v")).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }
    (longCols.map(profile(_, asLong = true)) ++
      strCols.map(profile(_, asLong = false)))
      .reduce(_ unionByName _)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forensic data-quality audits over numeric fact columns — Benford
  * first-digit conformance (fabricated-data detection) and Lorenz/Gini
  * concentration (how skewed a corpus or revenue distribution is). Both
  * integer-exact in ppm; both one aggregate over the fact table.
  */
object Audit {

  /** Benford's-law expected first-digit shares, in ppm:
    * floor(log10(1 + 1/d) · 1e6). A compile-time constant table — the law
    * itself, not data. */
  val BenfordPpm: Seq[(String, Long)] = Seq(
    "1" -> 301029L, "2" -> 176091L, "3" -> 124938L, "4" -> 96910L,
    "5" -> 79181L, "6" -> 66946L, "7" -> 57991L, "8" -> 51152L,
    "9" -> 45757L)

  /** First-digit distribution of a positive integer-unit column vs the
    * Benford expectation. Benford is scale-invariant, so auditing the
    * 1e-2/1e-4 integer units audits the underlying amounts.
    *
    * Output: (digit, n, obs_ppm, exp_ppm, dev_ppm) — one row per digit
    * observed. Scale shape: one map-combined 9-group aggregate; the
    * grand total is a 1-row cross join (the q90 scalar class); the
    * expectation is a 9-row literal frame. */
  def benford(df: DataFrame, unitsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val exp = BenfordPpm.toDF("digit", "exp_ppm")
    val counts = df.filter(col(unitsCol) > 0L)
      .select(substring(col(unitsCol).cast("string"), 1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    counts
      .crossJoin(counts.agg(sum(col("n")).as("__tot")))
      .withColumn("obs_ppm", expr("n * 1000000L div __tot"))
      .join(exp, Seq("digit"))
      .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }

  /** Per-group Gini coefficient of a non-negative long-valued column,
    * via the rank formulation G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over
    * values sorted ascending (ties broken by `tieCol` — engine-pinned).
    *
    * Output: (groupCol, n, total, gini_ppm). The ppm divides by the
    * PRE-SCALED denominator (`n·Σx div 1e6`) so the numerator stays in
    * int64 range at any corpus scale (n·Σx itself can pass 2^63 / 1e6);
    * groups too small for the scaled denominator (n·Σx < 1e6) report
    * NULL rather than a fabricated zero.
    *
    * Scale shape: one rank window partitioned by the group (no global
    * sort) and one group aggregate. */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__x").asc, col(tieCol).asc)
    df.select(col(groupCol), col(valueCol).cast("long").as("__x"),
        col(tieCol))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__s1"))
      .select(col(groupCol), col("n"), col("total"),
        when(expr("n * total div 1000000L") === 0L, lit(null))
          .otherwise(expr(
            "(2L * __s1 - (n + 1L) * total) div (n * total div 1000000L)"))
          .cast("long").as("gini_ppm"))
  }
}

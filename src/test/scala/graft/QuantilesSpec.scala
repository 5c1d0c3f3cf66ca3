package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantiles

/** The distributed value-histogram quantile operator must be BIT-identical
  * to the built-in exact `percentile` (which q87's DuckDB oracle already
  * hash-matches) while never buffering a whole group — the built-in stays
  * here as the verifier, demoted from the registered plan (round-5 verdict
  * item 2). */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
  private val psSql = "array(0.0D, 0.25D, 0.5D, 0.9D, 0.99D, 1.0D)"

  private def builtin(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"grp").agg(
        count(lit(1)).as("n"),
        expr(s"percentile(v, $psSql)").as("qs"),
        min($"v").as("mn"), max($"v").as("mx"))
      .select($"grp", $"n", $"qs", $"mn", $"mx")
      .as[(String, Long, Seq[Double], Long, Long)].collect().sortBy(_._1).toSeq

  private def histo(df: org.apache.spark.sql.DataFrame) =
    Quantiles.profile(df, "grp", "v", ps)
      .select($"grp", $"n_rows", $"quantiles", $"vmin", $"vmax")
      .as[(String, Long, Seq[Double], Long, Long)].collect().sortBy(_._1).toSeq

  test("profile is bit-identical to the built-in exact percentile (dup-heavy groups)") {
    val df = spark.range(0, 4000).select(
      concat(lit("g"), $"id" % 7).as("grp"),
      ($"id" * 37 % 211).as("v")) // ~19 rows per distinct value
    assert(histo(df) == builtin(df))
  }

  test("profile handles tiny, single-value, and two-value groups") {
    val df = Seq(
      ("one", 42L), // single row: every quantile = 42
      ("same", 7L), ("same", 7L), ("same", 7L), // one distinct value
      ("two", 1L), ("two", 9L)) // interpolation across the pair
      .toDF("grp", "v")
    assert(histo(df) == builtin(df))
  }

  test("null values: excluded from ranks, counted in n_rows") {
    val df = Seq(("g", Some(10L)), ("g", None), ("g", Some(20L)))
      .toDF("grp", "v")
    val row = Quantiles.profile(df, "grp", "v", Seq(0.5))
      .select($"n_rows", $"quantiles", $"vmin", $"vmax")
      .as[(Long, Seq[Double], Long, Long)].collect().head
    assert(row == ((3L, Seq(15.0), 10L, 20L)))
  }

  test("rankBuckets: exact-rank quintiles — hand-checked cutoffs, ties share a bucket") {
    // n=10, k=5 → cutoff q = min v with cum ≥ 2q over sorted
    // (1,1,1,2,3,4,5,6,7,8): c=(1,2,4,6); buckets follow strict-> rule
    val df = Seq(1L, 1L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDF("v")
    val got = Quantiles.rankBuckets(df, Seq(("v", "q")), 5)
      .select($"v", $"q").as[(Long, Long)].collect().sorted.toSeq
    val want = Seq(1L -> 1L, 1L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 3L, 5L -> 4L, 6L -> 4L, 7L -> 5L, 8L -> 5L)
    assert(got == want)
  }

  test("rankBuckets: several metrics bucket independently off one input pass") {
    val df = (1L to 20L).map(i => (i, 21L - i, i % 3)).toDF("a", "b", "c")
    val out = Quantiles.rankBuckets(df,
      Seq(("a", "qa"), ("b", "qb"), ("c", "qc")), 4)
    val rows = out.select($"a", $"qa", $"qb").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // a ascending and b = 21−a descending: buckets mirror (qa + qb = 5)
    assert(rows.forall { case (_, qa, qb) => qa + qb == 5L })
    // c ∈ {0,1,2} with near-equal mass over n=20: cum(0)=7≥5, cum(1)=14≥10,
    // cum(2)=20≥15∧20 → cutoffs (0,1,2,2) → buckets 1,2,3
    val cBuckets = out.select($"c", $"qc").distinct()
      .as[(Long, Long)].collect().sorted.toSeq
    assert(cBuckets == Seq(0L -> 1L, 1L -> 2L, 2L -> 3L))
  }

  test("plan holds no per-group value buffer: histogram partial-agg, no percentile") {
    val df = spark.range(0, 100).select(lit("g").as("grp"), ($"id" % 5).as("v"))
    val plan = Quantiles.profile(df, "grp", "v", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"), s"built-in percentile crept back in:\n$plan")
    assert(plan.contains("partial_count"),
      s"expected map-side-combined (grp, v) histogram:\n$plan")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{RankEval, Sft}

/** Fourteenth query wave: eval-suite statistics and serving-side capacity
  * planning — the unbiased pass@k estimator over a sample log (q153) and
  * the prefix-cache savings report for a radix-caching serving fleet
  * (q154). Same determinism rules as [[Queries]]: integer micro-units,
  * falling-factorial products expanded as BIGINT literals, every derived
  * numeric cast to long.
  */
object Queries14 {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------- pass@k estimation
  private val PassGroup = 8 // samples per synthetic task (doc_id div 8)
  private val PassThresh = 650000L // quality_e6 floor for "correct"

  /** pass@{1,2,4} over a synthetic eval log: tasks are doc_id div 8
    * blocks (8 samples per task), a sample is "correct" when its q21
    * quality score clears 0.65 — see [[graft.ops.RankEval.passAtK]] for
    * the unbiased estimator and its integer-exact spelling. */
  val q153PassAtK: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    val samples = docs.select(
      expr(s"doc_id div $PassGroup").as("task_id"),
      graft.functions.TextFns.qualityScoreMicro(col("text")).as("quality_e6"))
    RankEval.passAtK(samples, "task_id",
        col("quality_e6") >= PassThresh, Seq(1, 2, 4))
      .orderBy("task_id")
  }

  val q153Sql: String = {
    def pass(k: Int): String = {
      val num = (0 until k).map(i => s"(n_samples - n_correct - $i)").mkString(" * ")
      val den = (0 until k).map(i => s"(n_samples - $i)").mkString(" * ")
      s"""(CASE WHEN n_samples - n_correct >= $k
         |    THEN 1000000 - (($num) * 1000000 // ($den))
         |    ELSE 1000000 END)::BIGINT AS pass_${k}_ppm""".stripMargin
    }
    s"""WITH s AS (SELECT doc_id // $PassGroup AS task_id,
       |    (${Queries2.QualitySqlExpr} >= $PassThresh) AS ok
       |  FROM documents),
       |a AS (SELECT task_id, count(*)::BIGINT AS n_samples,
       |    sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_correct
       |  FROM s GROUP BY 1)
       |SELECT task_id, n_samples, n_correct,
       |  ${pass(1)},
       |  ${pass(2)},
       |  ${pass(4)}
       |FROM a WHERE n_samples >= 4 ORDER BY task_id""".stripMargin
  }

  // -------------------------------------------- prefix-cache savings
  /** Serving-side prefix-cache capacity report: prompts assemble under a
    * per-route template (route = doc_id % 10 — ten system-prompt
    * families), and [[graft.ops.Sft.prefixCacheReport]] reports per route
    * how many characters a radix prefix cache absorbs. */
  val q154PrefixCache: Q = (spark, dir) => {
    val prompts = Tables.documents(spark, dir).select(
      (col("doc_id") % 10L).as("route_id"),
      concat(lit("sys: answer concisely\ntask "),
        (col("doc_id") % 10L).cast("string"), lit(": "),
        col("text")).as("prompt"))
    Sft.prefixCacheReport(prompts, "route_id", "prompt")
      .orderBy("route_id")
  }

  val q154Sql: String =
    s"""WITH p AS (SELECT doc_id % 10 AS route_id,
       |    'sys: answer concisely' || chr(10) || 'task ' ||
       |      (doc_id % 10)::VARCHAR || ': ' || text AS prompt
       |  FROM documents),
       |a AS (SELECT route_id, count(*)::BIGINT AS n_prompts,
       |    sum(length(prompt))::BIGINT AS total_chars,
       |    min(prompt) AS mn, max(prompt) AS mx
       |  FROM p GROUP BY 1),
       |l AS (SELECT route_id, n_prompts, total_chars,
       |    (CASE WHEN least(length(mn), length(mx)) = 0 THEN 0
       |          ELSE len(list_filter(
       |            generate_series(1, least(length(mn), length(mx))),
       |            i -> substr(mn, 1, i) = substr(mx, 1, i))) END)::BIGINT
       |      AS lcp_chars
       |  FROM a)
       |SELECT route_id, n_prompts, total_chars, lcp_chars,
       |  ((n_prompts - 1) * lcp_chars)::BIGINT AS saved_chars,
       |  (CASE WHEN total_chars = 0 THEN 0
       |        ELSE ((n_prompts - 1) * lcp_chars) * 1000000 // total_chars
       |   END)::BIGINT AS saved_ppm
       |FROM l ORDER BY route_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q153_pass_at_k" -> q153PassAtK,
    "q154_prefix_cache" -> q154PrefixCache)

  val oracle: Map[String, String] = Map(
    "q153_pass_at_k" -> q153Sql,
    "q154_prefix_cache" -> q154Sql)
}

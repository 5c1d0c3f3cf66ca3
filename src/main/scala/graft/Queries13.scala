package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Preference

/** Thirteenth query wave: post-training data prep and index compression —
  * RLHF/DPO preference-pair construction from reward-ranked candidates
  * (q147), usage-based BPE vocabulary pruning with its re-encode
  * inflation report (q148/q149), and product-quantization ANN
  * (codebooks / ADC search / recall audit, q150–q152). Same determinism
  * rules as [[Queries]]: integer micro-unit rewards, total-order window
  * tiebreaks, every derived numeric cast to long.
  */
object Queries13 {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------- preference-pair construction
  /** DPO data prep over the documents corpus: candidates group into
    * prompts (doc_id % 25 — the q05-style synthetic grouping), the reward
    * is the q21 integer quality score, and pairs come from
    * [[graft.ops.Preference.pairsFromRanked]] — mirrored best-vs-worst,
    * margin ≥ 0.01 (10 000 µ), at most 4 pairs per prompt. Output hashes
    * the full pair artifact: ids, both rewards, and the margin. */
  val q147PreferencePairs: Q = (spark, dir) => {
    val cand = Tables.documents(spark, dir).select(
      (col("doc_id") % 25L).as("prompt_id"), col("doc_id"),
      graft.functions.TextFns.qualityScoreMicro(col("text")).as("quality_e6"))
    Preference.pairsFromRanked(cand, "prompt_id", "doc_id", "quality_e6",
        minMargin = 10000L, maxPairs = 4)
      .select(col("prompt_id"), col("chosen_id"), col("rejected_id"),
        col("chosen_e6"), col("rejected_e6"), col("margin_e6"))
      .orderBy("prompt_id", "chosen_id")
  }

  val q147Sql: String =
    s"""WITH cand AS (SELECT doc_id % 25 AS prompt_id, doc_id,
       |    ${Queries2.QualitySqlExpr} AS quality_e6
       |  FROM documents),
       |rk AS (SELECT prompt_id, doc_id, quality_e6,
       |    row_number() OVER (PARTITION BY prompt_id
       |                       ORDER BY quality_e6 DESC, doc_id ASC) AS rb,
       |    row_number() OVER (PARTITION BY prompt_id
       |                       ORDER BY quality_e6 ASC, doc_id DESC) AS rw
       |  FROM cand)
       |SELECT c.prompt_id,
       |  c.doc_id AS chosen_id, r.doc_id AS rejected_id,
       |  c.quality_e6 AS chosen_e6, r.quality_e6 AS rejected_e6,
       |  (c.quality_e6 - r.quality_e6)::BIGINT AS margin_e6
       |FROM rk c JOIN rk r ON r.prompt_id = c.prompt_id AND r.rw = c.rb
       |WHERE c.rb <= 4 AND c.quality_e6 - r.quality_e6 >= 10000
       |ORDER BY c.prompt_id, c.doc_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q147_preference_pairs" -> q147PreferencePairs)

  val oracle: Map[String, String] = Map(
    "q147_preference_pairs" -> q147Sql)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thirty-fifth query wave: retrieval scale-hardening — the BM25
  * document-frequency cutoff (q234), the Lucene-class stopword cut that
  * removes the probe join's skew spine at corpus scale.
  */
object Queries35 {

  type Q = (SparkSession, String) => DataFrame

  /** q142's passage retrieval with ultra-high-df terms (> 30% of
    * passages) dropped from the probe — the deploy-scale spelling: a
    * stopword's postings list is corpus-sized, so it dominates both the
    * probe join's run time and its key skew while its near-zero idf
    * barely moves ranks. Top-5 per query re-ranked on surviving terms
    * only; [[graft.ops.Retrieval.bm25ScoresTerms]] `maxDfPpm`. */
  val q234PassageRetrievalDfCut: Q = (spark, dir) =>
    Queries12.passageRetrieval(spark, dir, maxDfPpm = Some(300000L))

  val q234Sql: String =
    s"""WITH ${Queries12.passageScoreCtes(Some(300000L))},
       |rk AS (SELECT q_id, passage_id, score_e6,
       |    row_number() OVER (PARTITION BY q_id
       |                       ORDER BY score_e6 DESC, passage_id) AS rank
       |  FROM sc)
       |SELECT q_id, passage_id, (passage_id // 10000)::BIGINT AS doc_id,
       |  score_e6, rank::BIGINT AS rank
       |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  val all: Map[String, Q] = Map(
    "q234_bm25_df_cutoff" -> q234PassageRetrievalDfCut)

  val oracle: Map[String, String] = Map(
    "q234_bm25_df_cutoff" -> q234Sql)
}

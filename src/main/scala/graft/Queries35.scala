package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{Audit, Mixture, Quantiles, Retrieval}

/** Thirty-fifth query wave: retrieval scale-hardening and global-order
  * analytics on the round-13 two-phase rank/cumsum primitive — the BM25
  * document-frequency cutoff (q234), token-budget best-first data
  * selection (q235), the Lorenz concentration curve (q236), and exact
  * order statistics over an all-distinct domain (q237). None of the four
  * plans a single-partition exchange.
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

  /** Best-first pretraining selection under a 50k-token corpus budget:
    * documents scored by unique-token ratio (a cheap quality proxy —
    * repetitive docs score low), globally ranked, kept top-down while the
    * running token total fits. [[graft.ops.Mixture.budgetSelection]]. */
  val q235BudgetSelection: Q = (spark, dir) => {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"),
        // array_remove: wordTokens emits [""] on whitespace-only text —
        // mirror the oracle's blank filter (codegen'd, no HOF)
        array_remove(graft.functions.TextFns.wordTokens(col("text")), "")
          .as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("__toks"))).cast("long").as("__uniq"))
      .filter(col("n_tokens") > 0L)
      .withColumn("score_ppm", expr("__uniq * 1000000L div n_tokens"))
    Mixture.budgetSelection(scored, "doc_id", "score_ppm", "n_tokens",
        budget = 50000L)
      .orderBy("rank")
  }

  val q235Sql: String =
    """WITH tok AS (SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS ts
      |  FROM documents),
      |per AS (SELECT doc_id,
      |    len(list_filter(ts, t -> t <> ''))::BIGINT AS n_tokens,
      |    len(list_distinct(list_filter(ts, t -> t <> '')))::BIGINT AS uniq
      |  FROM tok),
      |sc AS (SELECT doc_id, n_tokens,
      |    (uniq * 1000000 // n_tokens)::BIGINT AS score_ppm
      |  FROM per WHERE n_tokens > 0),
      |r AS (SELECT doc_id, score_ppm, n_tokens,
      |    row_number() OVER (ORDER BY score_ppm DESC, doc_id ASC)::BIGINT
      |      AS rank,
      |    sum(n_tokens) OVER (ORDER BY score_ppm DESC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |      AS cum_tokens
      |  FROM sc)
      |SELECT rank, doc_id, score_ppm, n_tokens, cum_tokens
      |FROM r WHERE cum_tokens <= 50000 ORDER BY rank""".stripMargin

  /** Corpus concentration: lineitem revenue over parts as a 20-bucket
    * Lorenz table — "the top 5% of SKUs hold X% of revenue".
    * [[graft.ops.Audit.lorenzCurve]]. */
  val q236LorenzCurve: Q = (spark, dir) =>
    Audit.lorenzCurve(Tables.lineitem(spark, dir)
        .select(col("l_partkey"),
          round(col("l_extendedprice") * 100).cast("long").as("rev_e2")),
      "l_partkey", "rev_e2", nBuckets = 20)
      .orderBy("bucket")

  val q236Sql: String =
    """WITH per AS (SELECT l_partkey,
      |    sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS value
      |  FROM lineitem GROUP BY 1),
      |nn AS (SELECT count(*)::BIGINT AS n, sum(value) AS tot FROM per),
      |r AS (SELECT value,
      |    row_number() OVER (ORDER BY value DESC, l_partkey ASC)::BIGINT
      |      AS rank,
      |    sum(value) OVER (ORDER BY value DESC, l_partkey ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
      |  FROM per),
      |b AS (SELECT ((rank * 20 + nn.n - 1) // nn.n)::BIGINT AS bucket,
      |    value, cum, nn.tot FROM r CROSS JOIN nn)
      |SELECT bucket, count(*)::BIGINT AS n_entities,
      |  sum(value)::BIGINT AS value_sum, max(cum)::BIGINT AS cum_value,
      |  (CASE WHEN max(tot) <= 9223372036854
      |    THEN max(cum) * 1000000 // max(tot)::BIGINT
      |    ELSE max(cum) // (max(tot) // 1000000)::BIGINT END)::BIGINT
      |    AS cum_share_ppm
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact p50/p90/p99/p100 of the per-user monetary total — an
    * all-distinct domain where the histogram spelling degenerates;
    * [[graft.ops.Quantiles.orderStatistics]] (two-phase rank select). */
  val q237OrderStatistics: Q = (spark, dir) => {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 10000).cast("long")).as("monetary_e4"))
    Quantiles.orderStatistics(perUser, "monetary_e4", "user_id",
        Seq(50, 90, 99, 100))
      .orderBy("p")
  }

  val q237Sql: String =
    """WITH pu AS (SELECT user_id,
      |    sum(round(value * 10000)::BIGINT)::BIGINT AS monetary_e4
      |  FROM events GROUP BY 1),
      |nn AS (SELECT count(*)::BIGINT AS n FROM pu),
      |r AS (SELECT monetary_e4,
      |    row_number() OVER (ORDER BY monetary_e4 ASC, user_id ASC)::BIGINT
      |      AS rank
      |  FROM pu),
      |t AS (SELECT p, ((p * nn.n + 99) // 100)::BIGINT AS rank
      |  FROM (VALUES (50), (90), (99), (100)) v(p) CROSS JOIN nn)
      |SELECT t.p::BIGINT AS p, t.rank, r.monetary_e4
      |FROM t JOIN r USING (rank) ORDER BY p""".stripMargin

  val all: Map[String, Q] = Map(
    "q234_bm25_df_cutoff" -> q234PassageRetrievalDfCut,
    "q235_budget_selection" -> q235BudgetSelection,
    "q236_lorenz_curve" -> q236LorenzCurve,
    "q237_order_statistics" -> q237OrderStatistics)

  val oracle: Map[String, String] = Map(
    "q234_bm25_df_cutoff" -> q234Sql,
    "q235_budget_selection" -> q235Sql,
    "q236_lorenz_curve" -> q236Sql,
    "q237_order_statistics" -> q237Sql)
}

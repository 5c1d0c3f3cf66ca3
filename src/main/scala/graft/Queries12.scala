package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{Graph, RankEval, Retrieval, Similarity}

/** Twelfth query wave: the evaluation-and-governance layer over the wave-11
  * retrieval stack — pseudo-relevance-feedback query expansion (q134, the
  * second-pass retrieval input), weak-label nDCG/MRR retrieval audit
  * (q135), and clamped label propagation over the kNN graph (q136,
  * semi-supervised curation). Same determinism rules as [[Queries]]; the
  * DCG gain tables are driver-computed integer literals shared between the
  * Spark plan and the oracle SQL, so no libm call survives to run time.
  */
object Queries12 {

  type Q = (SparkSession, String) => DataFrame

  // ----------------------------------------- PRF query expansion
  /** RM3-lite expansion terms: BM25 top-5 feedback docs per query (the
    * q130 query sample), terms weighted by summed length-normalized
    * frequency, query's own terms excluded, top-3 kept — see
    * [[graft.ops.Retrieval.prfExpansionTerms]]. */
  val q134PrfExpansion: Q = (spark, dir) => {
    val d = Tables.documents(spark, dir)
    val queries = d.filter(col("doc_id") % 50 === 7L)
      .select(col("doc_id").as("q_id"), col("text").as("q_text"))
    Retrieval.prfExpansionTerms(d, "doc_id", "text",
        queries, "q_id", "q_text", fbK = 5, nTerms = 3)
      .orderBy("q_id", "rank")
  }

  val q134Sql: String =
    s"""WITH ${Queries11.bm25CtesShared(5)},
       |fb AS MATERIALIZED (SELECT q_id, doc_id FROM lexrk),
       |ex AS MATERIALIZED (SELECT f.q_id, t.term,
       |    sum(t.tf * 1000000 // l.dl)::BIGINT AS weight_ppm
       |  FROM fb f JOIN tf t USING (doc_id) JOIN dl l USING (doc_id)
       |  GROUP BY 1, 2),
       |fe AS (SELECT e.q_id, e.term, e.weight_ppm
       |  FROM ex e LEFT JOIN qt q ON q.q_id = e.q_id AND q.term = e.term
       |  WHERE q.term IS NULL),
       |rk AS (SELECT q_id, term, weight_ppm,
       |    row_number() OVER (PARTITION BY q_id
       |                       ORDER BY weight_ppm DESC, term) AS rank
       |  FROM fe)
       |SELECT q_id, term, weight_ppm, rank::BIGINT AS rank
       |FROM rk WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  // ------------------------------------- retrieval quality audit
  /** nDCG@10 / MRR / recall of the cosine-kNN route under cluster-label
    * agreement as weak relevance (a retrieved vector is "relevant" when
    * it shares the query's `label`) — see [[graft.ops.RankEval.ndcgAudit]].
    * The same audit runs against click logs or editorial judgments at
    * deploy time; labels make it self-contained here. */
  val q135RetrievalNdcg: Q = (spark, dir) => {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") % 50 === 7L)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"),
        col("label").as("__qlab"))
    val ranked = Similarity.knnJoin(e, "vec_id", "embedding",
      queries.select(col("q_id"), col("qvec")), "q_id", "qvec", 10)
    val rels = queries.select(col("q_id"), col("__qlab"))
      .join(e.select(col("vec_id"), col("label")),
        col("label") === col("__qlab") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
    RankEval.ndcgAudit(ranked, "q_id", "vec_id", "rank", rels, k = 10)
      .orderBy("q_id")
  }

  val q135Sql: String = {
    val gains = RankEval.dcgGainsE6(10).mkString(", ")
    val cum = RankEval.idealCumE6(10).mkString(", ")
    s"""WITH qs AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS qvec, label AS qlab
       |  FROM embeddings WHERE vec_id % 50 = 7),
       |rkd AS MATERIALIZED (SELECT q_id, vec_id, rank FROM (
       |  SELECT q.q_id, e.vec_id,
       |    row_number() OVER (PARTITION BY q.q_id ORDER BY
       |      round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[]), 6) DESC,
       |      e.vec_id) AS rank
       |  FROM embeddings e, qs q WHERE e.vec_id != q.q_id) WHERE rank <= 10),
       |rels AS MATERIALIZED (SELECT q.q_id, e.vec_id
       |  FROM qs q JOIN embeddings e ON e.label = q.qlab AND e.vec_id != q.q_id),
       |tot AS (SELECT q_id, count(*)::BIGINT AS n_rel_total FROM rels GROUP BY 1),
       |g AS (SELECT [$gains] AS gains, [$cum] AS cum),
       |mk AS (SELECT r.q_id,
       |    count(l.vec_id)::BIGINT AS n_rel_at_k,
       |    coalesce(sum(CASE WHEN l.vec_id IS NOT NULL
       |      THEN (SELECT gains FROM g)[r.rank] END), 0)::BIGINT AS dcg_e6,
       |    min(CASE WHEN l.vec_id IS NOT NULL THEN r.rank END)::BIGINT AS first_rel
       |  FROM rkd r LEFT JOIN rels l ON l.q_id = r.q_id AND l.vec_id = r.vec_id
       |  GROUP BY 1)
       |SELECT m.q_id, m.n_rel_at_k,
       |  coalesce(t.n_rel_total, 0)::BIGINT AS n_rel_total,
       |  coalesce(1000000 // m.first_rel, 0)::BIGINT AS mrr_ppm,
       |  m.dcg_e6,
       |  (CASE WHEN coalesce(t.n_rel_total, 0) = 0 THEN 0
       |        ELSE (SELECT cum FROM g)[least(t.n_rel_total, 10)::INT]
       |   END)::BIGINT AS idcg_e6,
       |  (CASE WHEN coalesce(t.n_rel_total, 0) = 0 THEN 0
       |        ELSE m.dcg_e6 * 1000000 // (SELECT cum FROM g)[least(t.n_rel_total, 10)::INT]
       |   END)::BIGINT AS ndcg_ppm
       |FROM mk m LEFT JOIN tot t USING (q_id)
       |ORDER BY m.q_id""".stripMargin
  }

  // --------------------------------------- kNN label propagation
  /** Semi-supervised labeling: every 5th vector forms the q133 3-NN
    * graph; nodes whose vec_id is also divisible by 3 seed their true
    * `label`, and 3 clamped propagation rounds spread labels by
    * out-neighbor majority (ties to the smallest label) — see
    * [[graft.ops.Graph.labelPropagation]]. */
  val q136LabelPropagation: Q = (spark, dir) => {
    val s = Tables.embeddings(spark, dir).filter(col("vec_id") % 5 === 0L)
    val qv = s.select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val edges = Similarity.knnJoin(s, "vec_id", "embedding", qv, "q_id", "qvec", 3)
    val seeds = s.filter(col("vec_id") % 3 === 0L)
      .select(col("vec_id"), col("label"))
    Graph.labelPropagation(edges, "q_id", "vec_id", seeds, "vec_id", "label",
        iters = 3)
      .orderBy("node")
  }

  private def lpRoundSql(k: Int): String =
    s"""ct$k AS MATERIALIZED (SELECT e.src AS v, l.lab, count(*)::BIGINT AS c
       |  FROM k3 e JOIN l${k - 1} l ON l.v = e.dst
       |  WHERE l.lab IS NOT NULL GROUP BY 1, 2),
       |pk$k AS MATERIALIZED (SELECT v, lab FROM (
       |  SELECT v, lab, row_number() OVER (PARTITION BY v
       |    ORDER BY c DESC, lab ASC) AS rn FROM ct$k) WHERE rn = 1),
       |l$k AS MATERIALIZED (SELECT l.v,
       |    CASE WHEN l.seed THEN l.lab ELSE coalesce(p.lab, l.lab) END AS lab,
       |    l.seed
       |  FROM l${k - 1} l LEFT JOIN pk$k p ON p.v = l.v)""".stripMargin

  val q136Sql: String = {
    val rounds = (1 to 3).map(lpRoundSql).mkString(",\n")
    s"""WITH s AS MATERIALIZED (SELECT vec_id, embedding, label FROM embeddings
       |  WHERE vec_id % 5 = 0),
       |k3 AS MATERIALIZED (SELECT q_id AS src, vec_id AS dst FROM (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rk
       |  FROM (
       |    SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
       |      round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS sim
       |    FROM s e JOIN s q ON e.vec_id != q.vec_id) p) r
       |  WHERE rk <= 3),
       |nodes AS MATERIALIZED (SELECT DISTINCT v FROM (
       |  SELECT src AS v FROM k3 UNION ALL SELECT dst FROM k3)),
       |l0 AS MATERIALIZED (SELECT n.v, sd.lab, sd.lab IS NOT NULL AS seed
       |  FROM nodes n LEFT JOIN (
       |    SELECT vec_id AS v, label::BIGINT AS lab FROM s
       |    WHERE vec_id % 3 = 0) sd ON sd.v = n.v),
       |$rounds
       |SELECT v AS node, coalesce(lab, -1)::BIGINT AS label, seed AS is_seed
       |FROM l3 ORDER BY node""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q134_prf_expansion" -> q134PrfExpansion,
    "q135_retrieval_ndcg" -> q135RetrievalNdcg,
    "q136_label_propagation" -> q136LabelPropagation)

  val oracle: Map[String, String] = Map(
    "q134_prf_expansion" -> q134Sql,
    "q135_retrieval_ndcg" -> q135Sql,
    "q136_label_propagation" -> q136Sql)
}

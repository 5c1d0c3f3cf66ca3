package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, RankEval, Retrieval}

/** Wave 12 follow-on: PRF expansion, nDCG/MRR audit, label propagation. */
class Wave13Spec extends SparkSpec {
  import spark.implicits._

  test("prfExpansionTerms: feedback terms weighted, query terms excluded") {
    // query "apple" retrieves docs 2/3 (both contain it); their terms
    // weight by tf*1e6 div dl, summed across the feedback set
    val docs = Seq(
      (1L, "apple"),
      (2L, "apple banana banana cherry"),
      (3L, "apple banana durian durian")).toDF("doc_id", "text")
    val q = Seq((1L, "apple")).toDF("q_id", "q_text")
    val out = Retrieval.prfExpansionTerms(docs, "doc_id", "text",
        q, "q_id", "q_text", fbK = 2, nTerms = 10)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    // banana: doc2 2/4 + doc3 1/4 -> 500000 + 250000 = 750000 (rank 1)
    // durian: doc3 2/4 -> 500000 (rank 2); cherry: doc2 1/4 -> 250000
    // apple is a query term -> excluded despite appearing in both docs
    assert(out == Map(
      "banana" -> ((750000L, 1L)),
      "durian" -> ((500000L, 2L)),
      "cherry" -> ((250000L, 3L))))
  }

  test("ndcgAudit: hand-checked gains, truncation-aware ideal") {
    // q1: rel docs {11, 13, 99}; ranked 11@1 (hit), 12@2, 13@3 (hit)
    //   dcg = g(1)+g(3); ideal = 3 rels -> cum(3); mrr = 1e6 div 1
    // q2: no rels -> all zeros, vacuous ndcg 0
    val ranked = Seq(
      (1L, 11L, 1L), (1L, 12L, 2L), (1L, 13L, 3L),
      (2L, 11L, 1L), (2L, 12L, 2L)).toDF("q_id", "doc_id", "rank")
    val rels = Seq((1L, 11L), (1L, 13L), (1L, 99L)).toDF("q_id", "doc_id")
    val g = RankEval.dcgGainsE6(10)
    val cum = RankEval.idealCumE6(10)
    val out = RankEval.ndcgAudit(ranked, "q_id", "doc_id", "rank", rels, 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val dcg1 = g(0) + g(2)
    assert(out(1L) == ((1L, 2L, 3L, 1000000L, dcg1, cum(2),
      dcg1 * 1000000L / cum(2))))
    assert(out(2L) == ((2L, 0L, 0L, 0L, 0L, 0L, 0L)))
    // gain table sanity: g(1) is exactly 1e6 (log2(2) = 1), monotone down
    assert(g(0) == 1000000L && g.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("ndcgAudit: more relevant docs than k caps the ideal at k") {
    val ranked = (1L to 10L).map(r => (1L, 100L + r, r)).toDF("q_id", "doc_id", "rank")
    val rels = (1L to 30L).map(d => (1L, 100L + d)).toDF("q_id", "doc_id")
    val out = RankEval.ndcgAudit(ranked, "q_id", "doc_id", "rank", rels, 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    // every ranked doc is relevant -> dcg == idcg == cum(10), ndcg == 1e6
    assert(out == ((1L, 10L, 30L, 1000000L,
      RankEval.idealCumE6(10).last, RankEval.idealCumE6(10).last, 1000000L)))
  }

  test("labelPropagation: clamping, majority, tie-break, unreachable") {
    // seeds: 1->7, 2->9. edges: 3->{1,2} (tie -> smallest label 7);
    // 4->{1} (adopts 7); 5->{6} (6 unlabeled forever -> 5 stays -1);
    // 2 is a seed pointing at 1 — must NOT flip to 7
    val edges = Seq((3L, 1L), (3L, 2L), (4L, 1L), (5L, 6L), (2L, 1L), (6L, 5L))
      .toDF("src", "dst")
    val seeds = Seq((1L, 7), (2L, 9)).toDF("node", "label")
    val out = Graph.labelPropagation(edges, "src", "dst", seeds, "node", "label", 3)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((7L, true)) && out(2L) == ((9L, true)))
    assert(out(3L) == ((7L, false)), "tie breaks to the smallest label")
    assert(out(4L) == ((7L, false)))
    assert(out(5L) == ((-1L, false)) && out(6L) == ((-1L, false)),
      "an unlabeled island stays -1")
  }

  test("labelPropagation: labels reach two hops in two rounds, not one") {
    // chain 3 -> 2 -> 1(seed): after 1 round only 2 is labeled; after 2, 3 too
    val edges = Seq((2L, 1L), (3L, 2L)).toDF("src", "dst")
    val seeds = Seq((1L, 5)).toDF("node", "label")
    def labOf(iters: Int): Map[Long, Long] =
      Graph.labelPropagation(edges, "src", "dst", seeds, "node", "label", iters)
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(labOf(1) == Map(1L -> 5L, 2L -> 5L, 3L -> -1L))
    assert(labOf(2) == Map(1L -> 5L, 2L -> 5L, 3L -> 5L))
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape audit over every registered query: flags the operators that
  * become 100 TB incidents — cartesian products, nested-loop joins where a
  * hash join was expected, missing scan pushdown — and prints an exchange/
  * sort/aggregate census per query for eyeballing regressions. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // known, justified exceptions — every nested loop here runs over a
    // BOUNDED side: q18/q41 cross-join a 1-row query vector, q16's exact
    // verifier is capped to the vec_id<2000 sample slice (the cap is part
    // of its contract; unbounded inputs take q17/q37/q47 instead)
    val allowNestedLoop = Set("q16_near_dup_embed", "q18_cosine_topk",
      "q19_knn_join", "q29_rag_context", "q37_ivf_topk", "q41_sql_cosine",
      "q42_rag_prompt", "q61_tfidf", "q75_quantized_topk",
      // q83's serving tail cross-joins the 1-row query vector (q18's shape);
      // the pipeline/clustering upstream is already materialized by its
      // checkpoints, so the audit sees only that bounded tail
      "q83_pipeline_golden",
      // q90/q91/q94 cross-join a 1-ROW grand total (a broadcast scalar)
      // into a ≤|strata|-row aggregate — bounded by construction; q98's
      // vocab section composes q90's topVocab and inherits the same shape
      "q90_vocab_coverage", "q91_oov_quality", "q94_temperature_mix",
      "q98_corpus_datasheet",
      // q112/q113 cross-join the 1-row (nt, nr) grand-total broadcast;
      // q114 cross-joins the broadcast `points`-row checkpoint grid
      "q112_dsir_weights", "q113_selection_capstone", "q114_heaps_fit",
      // q130/q131 cross-join BM25's 1-ROW corpus-stats aggregate (N,
      // avgdl) — the q61 class; q131/q132 additionally broadcast the
      // bounded query/anchor sample through knnJoin — the q19 class
      "q130_bm25", "q131_hybrid_rrf", "q132_hard_negatives",
      // q134 inherits BM25's 1-row stats cross join through its feedback
      // pass; q135's ranking route broadcasts the bounded query sample
      // (the q19 class)
      "q134_prf_expansion", "q135_retrieval_ndcg",
      // q137 is q134's two-pass composition (same 1-row stats hint);
      // q138 composes all three routes — BM25's stats + q19-class knn
      "q137_expanded_bm25", "q138_route_ab",
      // q139 cross-joins the 1-ROW Tukey-fence aggregate; q140 the
      // 1-ROW release totals — both broadcast scalars by construction
      "q139_norm_outliers", "q140_release_psi",
      // q142/q143 are BM25 over passages — the same 1-row stats cross join
      "q142_passage_retrieval", "q143_passage_context",
      // q122 cross-joins the broadcast ≤nlist centroid table into the
      // recall audit's probe routing (the q37 class); q128 cross-joins
      // the 1-ROW train-split token grand total (the q90 scalar class)
      "q122_ivf_recall", "q128_trigram_backoff",
      // q178 pair-joins the per-source MinHash SIGNATURE frame on
      // src_a < src_b — one row per source by construction (the
      // groupBy(source) output), so the nested loop is |sources|²
      // over a broadcast-sized frame, not corpus-scaled
      "q178_source_overlap",
      // q181 cross-joins the 1-ROW normalization denominator each round
      // and the 1-ROW convergence audit at the end (the q90 scalar
      // class); q185 cross-joins three 1-ROW aggregates (per-source
      // rollup, merged estimate, exact count) into its single output row
      "q181_power_iteration", "q185_hll_merge",
      // q186 cross-joins the 1-ROW vv/before/after/total audit
      // aggregates; q187 the 1-ROW token grand total (the q90 scalar
      // class); q188 the 1-ROW straddle audit; q189 the 1-ROW global
      // cutoff — all statically bounded scalars
      "q186_all_but_top", "q187_collocations", "q188_cluster_folds",
      "q189_threshold_calibration",
      // q191 cross-joins the 1-ROW Herfindahl baseline (the q90 scalar
      // class)
      "q191_shuffle_quality",
      // q207 cross-joins the 1-ROW basket grand total into the 25-row
      // singleton frame and the ≤|brands|² pair frame; q211 the 1-ROW
      // digit grand total into a 9-row frame; q213 the 1-ROW reference
      // day — all the q90 scalar class
      "q207_assoc_rules", "q211_benford", "q213_decay_score",
      // q216 cross-joins the 1-ROW revenue grand total into the
      // |parts|-row dimension frame (the q90 scalar class)
      "q216_abc_parts",
      // q225 cross-joins the 1-ROW modal-dimension pick (a limit(1)
      // over the |dims|-row histogram) into the id-join frame
      "q225_vector_store_audit",
      // q226 broadcasts the 1-ROW decile-cutoff frame; q227 the 1-ROW
      // corpus totals (the q90 scalar class); q228 inherits BM25's
      // 1-row corpus-stats cross join (the q130 class)
      "q226_decile_mix", "q227_emerging_terms", "q228_rerank_agreement",
      // q229 cross-joins the 1-ROW bucket grand total into the k-row
      // histogram; q230 the 1-ROW weight/size totals into the
      // |strata|-row frame (the q90 scalar class)
      "q229_sampler_uniformity", "q230_variance_allocation",
      // q233 broadcasts the 1-ROW join-output grand total into the
      // checkpointed key frame (statically bounded by construction)
      "q233_join_amplification",
      // q206 broadcasts three 1-ROW quintile-cutoff frames (the
      // rankBuckets contract); q234/q241 inherit BM25's 1-row
      // corpus-stats cross join (the q130 class; q241 twice — one per
      // route)
      "q206_rfm_segments", "q234_bm25_df_cutoff", "q241_cutoff_agreement")
    // Unpartitioned logical windows (`Window.orderBy` with no partition
    // key) plan as Exchange SinglePartition + one-task sort — the q216/
    // q206 round-13 lesson. Deliberate, BOUNDED-frame exceptions only;
    // every entry names its bound. Anything else flags UNPARTWIN!.
    val allowUnpartWindow = Set(
      // topVocabFromCounts discipline: orderBy+limit(k) FIRST, the rank
      // window then runs over ≤k rows (q90/q91/q96/q98/q107/q224 compose
      // it; q148/q149 rank the ≤|vocab| merge-artifact frame)
      "q90_vocab_coverage", "q91_oov_quality", "q111_zipf_fit",
      "q98_corpus_datasheet", "q107_vocab_materialized",
      "q224_nucleus_vocab", "q148_vocab_prune", "q149_prune_impact",
      // seed init: window over the ≤k-row orderBy+limit(k) head
      // (Embed.lloydQuantized / Pq.codebooks / ivf builders)
      "q31_kmeans", "q37_ivf_topk", "q47_embed_lsh", "q75_quantized_topk",
      "q81_density_clusters", "q83_pipeline_golden", "q104_canonical_dedup",
      "q113_selection_capstone", "q115_semantic_dedup",
      "q116_semantic_dispersion", "q117_semantic_thinning_report",
      "q122_ivf_recall", "q124_semantic_decon",
      "q150_pq_codebook", "q151_pq_adc_topk", "q152_pq_recall",
      // histogram-cumulative cutoffs: windows over the DISTINCT-value
      // frame, bounded by the value domain (q179's bins, q189/q226's
      // score domain, q87's length domain)
      "q87_length_quantiles", "q179_hist_quantiles",
      "q189_threshold_calibration", "q226_decile_mix",
      // artifact-sized round frames: BPE merge ranks over the ≤|vocab|
      // pair frame; unigram DP/backtrack over ≤charset^n gram frames
      "q120_bpe_merges", "q121_bpe_compression", "q125_bpe_segment_new",
      "q126_tokenizer_fertility", "q158_unigram_segment",
      // report-sized frames: epoch curriculum ranks |epochs|·manifest
      // rows after the budget cut (q105); needle grid ≤|depths|·|lengths|
      // (q146); eval matrices ≤|tasks|·|models| (q153/q176); DoReMi's
      // |domains| frame (q156); pass@k/best-of-n per-prompt shortlists
      // (q155/q163/q167 group-bounded but their summary rank is global
      // over ≤|items| leaderboard rows)
      "q105_epoch_order", "q146_needle_depth", "q153_pass_at_k",
      "q155_best_of_n", "q156_doremi_weights", "q163_bradley_terry",
      "q167_self_consistency", "q176_trimmed_eval",
      // q168's ECE rollup windows over the ≤|bins| calibration frame
      // (10 rows by construction)
      "q168_ece")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val p = qe.explainString(ExplainMode.fromString("formatted"))
        def n(s: String): Int = s"""\\(\\d+\\) $s""".r.findAllIn(p).size
        val cart = n("CartesianProduct")
        val bnlj = n("BroadcastNestedLoopJoin")
        val uwin = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.size
        val flags = new StringBuilder
        if (cart > 0) flags.append(" CARTESIAN!")
        if (bnlj > 0 && !allowNestedLoop(name)) flags.append(" NESTEDLOOP!")
        if (uwin > 0 && !allowUnpartWindow(name)) flags.append(" UNPARTWIN!")
        // text-reading scans: each one is a pass over the corpus' fat
        // column — the dominant cost at 100 TB when a multi-section plan
        // fans out over union branches (Catalyst shares no subtrees)
        val textScans = """ReadSchema: [^\n]*\btext\b""".r.findAllIn(p).size
        println(f"$name%-26s ex=${n("Exchange")}%d sort=${n("Sort")}%d " +
          f"win=${n("Window")}%d scan=${n("Scan parquet")}%d tscan=$textScans%d" +
          f"${flags.toString}")
      } catch { case e: Throwable =>
        println(s"$name AUDIT-ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}

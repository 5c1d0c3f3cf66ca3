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
    runAudit(spark, sfDir).foreach { case (name, line) =>
      println(f"$name%-26s $line")
    }
    spark.stop()
  }

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
      "q206_rfm_segments", "q234_bm25_df_cutoff", "q241_cutoff_agreement",
      // q243 is q143's deploy spelling — the same 1-row stats cross join
      "q243_passage_context_cut",
      // q250 cross-joins the 1-ROW token grand total into the ≤64-row
      // length-band frame (the q90 scalar class; band frame checkpointed
      // so the scalar branch re-reads the pin, not the corpus)
      "q250_length_band_mix",
      // q251/q252 inherit BM25's 1-row corpus-stats cross join through
      // their context retrieval (the q130 class); everything after the
      // (checkpointed) context is shortlist-sized span joins — q255 (the
      // span-size sweep) rides the same inputs
      "q251_groundedness", "q252_attribution", "q255_groundedness_sweep",
      // q256 is the q130 probe over the zipf-remapped corpus — the same
      // 1-row corpus-stats cross join
      "q256_bm25_zipf",
      // q258/q259 broadcast the bounded query sample through knnJoin per
      // truncation route (the q19 class)
      "q258_matryoshka_overlap", "q259_matryoshka_sweep")
    // Unpartitioned logical windows (`Window.orderBy` with no partition
    // key) plan as Exchange SinglePartition + one-task sort — the q216/
    // q206 round-13 lesson. Two ways an unpartitioned window is
    // acceptable, checked in order:
    //
    //  1. STRUCTURALLY PROVEN from the plan itself (`boundedInput`): the
    //     window's input subtree is bounded — every corpus-scaled leaf
    //     sits below a LITERAL GlobalLimit/LocalLimit (the orderBy+
    //     limit(k)-first discipline: TakeOrderedAndProject heads, seed
    //     inits) or below a grand-total Aggregate (1 row by definition);
    //     literal LocalRelations are bounded; joins/unions of bounded
    //     inputs stay bounded. This is re-derived from the CURRENT plan
    //     on every audit run — a re-spelling that drops the limit makes
    //     the proof fail, it cannot be allowlisted by habit.
    //
    //  2. CONTRACT-bounded (`allowUnpartWindow` below): the bound is real
    //     but not visible in plan structure — value-DOMAIN-bounded
    //     aggregates (a histogram of lengths/scores is bounded by the
    //     domain, not by a limit node) and artifact-sized checkpointed
    //     frames (BPE vocab rounds land as opaque LogicalRDD leaves).
    //     Every entry names its bound; this list is the residue the
    //     structural proof can't reach, kept as small as possible.
    //
  // Round-14 shrink: the structural proof covers what used to be ~35
  // hand-maintained entries (the orderBy+limit(k)-first heads prove
  // themselves; the BPE/unigram round loops and most seed inits
  // materialize eagerly, so the registered plan carries no unpartitioned
  // window at all — if a re-spelling ever surfaces one, the flag fires
  // and the bound gets re-justified). Only the value-DOMAIN-bounded
  // histogram windows remain contracts the plan can't express.
  val allowUnpartWindow = Set(
    // histogram-cumulative cutoffs and report rollups: windows over
    // DISTINCT-value or per-domain frames, bounded by the value DOMAIN
    // (q189/q226's integer score domain; q98's datasheet sections) —
    // grouping aggregates, structurally opaque
      "q189_threshold_calibration", "q226_decile_mix",
      "q98_corpus_datasheet",
    // q156's DoReMi rounds window over the ≤|domains| frame (grouping
    // aggregate over the domain key)
      "q156_doremi_weights",
    // q168's ECE rollup windows over the ≤|bins| calibration frame
    // (10 rows by construction)
      "q168_ece")

    // Anything matching neither flags UNPARTWIN!.

  /** Audit ONE already-built frame: returns the census + flag line
    * ("ex=… sort=… [CARTESIAN!|NESTEDLOOP!|UNPARTWIN!]"). `name` selects
    * the allowlists; a frame that cannot even plan returns
    * "AUDIT-ERROR <class>". Exposed so PlanAuditSpec can flag a
    * deliberately broken plan without registering it. */
  def auditOne(name: String,
      df: org.apache.spark.sql.DataFrame): String = {
    def boundedInput(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.plans.logical._
      p match {
        case g: GlobalLimit => g.limitExpr.isInstanceOf[Literal]
        case l: LocalLimit => l.limitExpr.isInstanceOf[Literal]
        case a: Aggregate if a.groupingExpressions.isEmpty => true // 1 row
        case _: LocalRelation | _: OneRowRelation => true // literal frame
        case _ if p.children.isEmpty => false // scan/RDD leaf: corpus-scaled
        case _ => p.children.forall(boundedInput)
      }
    }
    try {
      val qe = df.queryExecution
      val p = qe.explainString(ExplainMode.fromString("formatted"))
      def n(s: String): Int = s"""\\(\\d+\\) $s""".r.findAllIn(p).size
      val cart = n("CartesianProduct")
      val bnlj = n("BroadcastNestedLoopJoin")
      val uwinAll = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      val (proven, contracted) = uwinAll.partition(w => boundedInput(w.child))
      val flags = new StringBuilder
      if (cart > 0) flags.append(" CARTESIAN!")
      if (bnlj > 0 && !allowNestedLoop(name)) flags.append(" NESTEDLOOP!")
      if (proven.nonEmpty) flags.append(s" uwin-proven=${proven.size}")
      if (contracted.nonEmpty) {
        if (allowUnpartWindow(name))
          flags.append(s" uwin-contract=${contracted.size}")
        else flags.append(" UNPARTWIN!")
      }
      // text-reading scans: each one is a pass over the corpus' fat
      // column — the dominant cost at 100 TB when a multi-section plan
      // fans out over union branches (Catalyst shares no subtrees)
      val textScans = """ReadSchema: [^\n]*\btext\b""".r.findAllIn(p).size
      f"ex=${n("Exchange")}%d sort=${n("Sort")}%d " +
        f"win=${n("Window")}%d scan=${n("Scan parquet")}%d tscan=$textScans%d" +
        flags.toString
    } catch { case e: Throwable =>
      s"AUDIT-ERROR ${e.getClass.getSimpleName}"
    }
  }

  /** Audit every registered query; returns (name, census+flags) rows.
    * PlanAuditSpec asserts zero flag tokens over this on every
    * `sbt test` (r15 verdict task 7 — the zero-flag sweep used to run
    * out-of-band only, so a new single-partition exchange surfaced at
    * judge time, not build time); the main below prints it. */
  def runAudit(spark: SparkSession, sfDir: String): Seq[(String, String)] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // frame CONSTRUCTION can throw too (eager checkpoint inputs) — that
      // is just as much an audit failure as an unplannable frame
      val flags =
        try auditOne(name, fn(spark, sfDir))
        catch { case e: Throwable => s"AUDIT-ERROR ${e.getClass.getSimpleName}" }
      name -> flags
    }
}

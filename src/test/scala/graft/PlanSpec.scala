package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan shape assertions — the scale contract, checked in CI:
  * filters reach the parquet scan, small dimensions broadcast, the top-N
  * window gets the group-limit rewrite, scans prune columns. A plan
  * regression here is a 100 TB incident even when results stay correct. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("point lookup pushes the predicate into the parquet scan") {
    val p = plan(SparkEntry.queries("q08_point_lookup")(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"), p)
  }

  test("doc filter pushes NOT-IN and lang IN into the scan") {
    val p = plan(SparkEntry.queries("q10_doc_filter")(spark, sfDir))
    assert(p.contains("PushedFilters") && p.contains("In(lang"), p)
  }

  test("two-hop join broadcasts the dimension side") {
    val p = plan(SparkEntry.queries("q09_two_hop")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("top-N per group gets the WindowGroupLimit rewrite (no full sort of losers)") {
    val p = plan(SparkEntry.queries("q02_topn_per_group")(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("global top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(SparkEntry.queries("q18_cosine_topk")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("narrow projection prunes the parquet read schema") {
    val p = plan(graft.io.Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"), readSchema)
    assert(!readSchema.contains("l_comment"), readSchema)
  }

  // tree nodes render as "+- Name (n)" — or "* Name (n)" when the node is
  // both root and inside whole-stage codegen; count those, not the detail
  // sections (whose headers are "(n) Name")
  private def nodes(p: String, name: String): Int =
    s"""(?:\\*|[+:]-)(?: \\*)? $name \\(\\d""".r.findAllIn(p).size

  test("rollup plans as one Expand + one shuffle, not one scan per grouping set") {
    val p = plan(SparkEntry.queries("q50_rollup")(spark, sfDir))
    assert(nodes(p, "Expand") == 1, p)
    assert(nodes(p, "Exchange") == 1, p)
    assert("""[+:]- Scan parquet""".r.findAllIn(p).size == 1, p)
  }

  test("four analytic functions over the same spec share one Window + one shuffle") {
    val p = plan(SparkEntry.queries("q51_window_analytics")(spark, sfDir))
    assert(nodes(p, "Window") == 1, p)
    assert(nodes(p, "Exchange") == 1, p)
  }

  test("unpivot is one Expand over one scan — no join, no shuffle") {
    val p = plan(SparkEntry.queries("q58_unpivot")(spark, sfDir))
    assert(nodes(p, "Expand") == 1, p)
    assert(nodes(p, "Exchange") == 0, p)
  }

  test("anti-join broadcasts the filter side") {
    val p = plan(SparkEntry.queries("q54_anti_join")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin LeftAnti"), p)
  }

  test("interval join is a hash join on the equi key, not a nested loop") {
    val p = plan(SparkEntry.queries("q57_interval_join")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin"), p)
  }

  test("cube plans as one Expand over one scan, like rollup") {
    val p = plan(SparkEntry.queries("q60_cube")(spark, sfDir))
    assert(nodes(p, "Expand") == 1, p)
    assert("""[+:]- Scan parquet""".r.findAllIn(p).size == 1, p)
  }

  test("latest-state argmax partial-aggregates before its single exchange") {
    val p = plan(SparkEntry.queries("q64_latest_state")(spark, sfDir))
    assert(nodes(p, "Window") == 0, p)
    assert(nodes(p, "Exchange") == 1, p)
    // partial + final: the shuffle carries one struct per (partition, user),
    // not the event log (max over a struct buffer plans as SortAggregate —
    // declarative aggregates with non-mutable buffers can't hash-aggregate —
    // but the map-side partial is what bounds the exchange)
    assert(nodes(p, "SortAggregate") == 2, p)
  }

  test("star-schema join broadcasts every dimension (no added shuffles)") {
    val p = plan(SparkEntry.queries("q67_star_join")(spark, sfDir))
    // count detail-section headers: one "(n) BroadcastHashJoin" per node
    assert("""\(\d+\) BroadcastHashJoin""".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("balanced sampling gets the per-group limit rewrite (k-row heaps)") {
    val p = plan(SparkEntry.queries("q69_balanced_sample")(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("heavy hitters top-k plans as TakeOrderedAndProject after the aggregate") {
    val p = plan(SparkEntry.queries("q71_heavy_hitters")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("full-outer reconciliation is a single hash/merge join, no row explosion") {
    val p = plan(SparkEntry.queries("q77_full_outer")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin FullOuter") || p.contains("ShuffledHashJoin FullOuter"), p)
  }

  test("fused cosine kernel participates in whole-stage codegen") {
    // q17's equi-join plan codegens end to end (q18's BroadcastNestedLoopJoin
    // does not support codegen, so the kernel runs its eval loop there —
    // still a single fused pass per pair)
    val df = SparkEntry.queries("q17_bucketed_near_dup")(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan (and codegen compiles)
    val p = df.queryExecution.executedPlan.toString()
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage; the
    // projection computing cosinesim must carry one
    assert(p.linesIterator.exists(l => l.contains("cosinesim") && l.contains("*(")), p)
  }

  test("fused shingle/minhash/simhash kernels stay inside whole-stage codegen") {
    // q14 (word shingles + minhash bands), q15 (simhash), q38 (char
    // shingles): the kernels were CodegenFallback before — one boxed
    // virtual call per row severing the stage. Now they must (a) be inside
    // a '*(n)' stage and (b) produce generated code Janino actually
    // compiles — WholeStageCodegenExec.doExecute would silently fall back
    // to interpreted eval otherwise, and no other assertion would notice.
    for ((q, marker) <- Seq(
        "q14_minhash_lsh" -> "minhashbandkeys",
        "q15_simhash" -> "simhashmd5",
        "q38_ngram_jaccard" -> "charshingles")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect() // finalize AQE so the executed plan is the real one
      val p = df.queryExecution.executedPlan.toString()
      assert(p.linesIterator.exists(l =>
        l.toLowerCase.contains(marker) && l.contains("*(")), s"$q:\n$p")
      val sources = org.apache.spark.sql.graftbridge.Bridge.compileWholeStageCodegen(df)
      assert(sources.exists(_.contains("graft.expr.HashKernels")) ||
             sources.exists(_.contains("graft.expr.ShingleKernels")), s"$q: kernel call not in generated code")
    }
  }

  // formatted explain prints each node twice (tree + detail section);
  // count distinct node ids, not raw substring hits
  private def exchangeNodes(p: String): Int =
    """\((\d+)\) Exchange""".r.findAllMatchIn(p).map(_.group(1)).toSet.size

  test("token-budget sample: big side shuffles once, bounded BELOW its window exchange") {
    // 3 shuffles total, but only ONE touches full-corpus rows: the stratum
    // window exchange, whose input the md5-bucket prefilter has already
    // bounded to ~budget rows per stratum. The other two act on the
    // (stratum × 65536)-row bucket histogram that computes the cutoffs,
    // which arrive at the big side by broadcast.
    val p = plan(SparkEntry.queries("q84_token_budget")(spark, sfDir))
    assert(exchangeNodes(p) == 3, s"expected 3 exchanges (1 big + 2 histogram):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"cutoffs must broadcast, not shuffle:\n$p")
    assert(p.contains("__graft_cut"), s"expected bucket-cutoff prefilter:\n$p")
  }

  test("vocab coverage: top-k by TakeOrdered (no global vocab sort); grand total broadcasts") {
    // the full vocabulary (10M+ types at 100 TB) must never be globally
    // sorted through one task — limit(k) after orderBy plans as per-
    // partition heaps; the cumsum window then runs over <=k rows and the
    // token grand total arrives as a 1-row broadcast
    val p = plan(SparkEntry.queries("q90_vocab_coverage")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"vocab head must heap-select:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"grand total must broadcast:\n$p")
  }

  test("in-vocab scoring: the vocabulary joins by broadcast, never a shuffle of tokens") {
    val p = plan(SparkEntry.queries("q91_oov_quality")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$p")
  }

  test("split report: pure map-side assignment, one aggregation exchange") {
    // md5-prefix split assignment is a projection; the only full-corpus
    // shuffle is the (split, lang) aggregation (plus the final presentation
    // sort's range exchange over the tiny report)
    val p = plan(SparkEntry.queries("q92_split_report")(spark, sfDir))
    assert(exchangeNodes(p) == 2, s"expected agg + presentation-sort exchanges only:\n$p")
    assert("""[+:]- Scan parquet""".r.findAllIn(p).size == 1, s"one scan, no self-join:\n$p")
  }

  test("length-quantile report: histogram partial-agg, no per-group percentile buffer") {
    // the registered q87 is the value-histogram form — the only shuffle of
    // full-corpus rows is the map-side-combined (lang, n_chars) count;
    // every later exchange moves histogram-sized data. The built-in exact
    // percentile (whole-group buffer) must NOT appear.
    val p = plan(SparkEntry.queries("q87_length_quantiles")(spark, sfDir))
    assert(!p.contains("percentile"), s"per-group percentile buffer crept back:\n$p")
    assert(p.contains("partial_count"), s"expected partial histogram counts:\n$p")
  }

  test("zipf fit: vocabulary head via TakeOrderedAndProject, never a global sort") {
    val p = plan(SparkEntry.queries("q111_zipf_fit")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("group cap: threshold side broadcasts, no window/sort over group members") {
    val p = plan(graft.ops.Mixture.groupCap(
      graft.io.Tables.documents(spark, sfDir), "lang", "doc_id", 100L))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains(") Window"),
      s"per-group window crept into groupCap:\n$p")
  }

  test("paragraph dedup: first-occurrence winner is an aggregate, not a window") {
    val p = plan(SparkEntry.queries("q110_paragraph_dedup")(spark, sfDir))
    assert(!p.contains(") Window"),
      s"window over line occurrences:\n$p")
    assert(p.contains("partial_min"), s"expected partial min(struct) winners:\n$p")
  }

  test("minhash: shingle table materializes once — no in-plan corpus rescans") {
    // all four consumers (band self-join sides, verify-join sides) must
    // read the checkpointed shingle RDD; a FileScan of text in this plan
    // means a branch decomposed back into its own scan + kernel run
    val p = plan(SparkEntry.queries("q14_minhash_lsh")(spark, sfDir))
    assert(!"""ReadSchema: [^\n]*\btext\b""".r.findAllIn(p).hasNext,
      s"q14 re-scans corpus text outside the shingle checkpoint:\n$p")
  }

  test("datasheet: corpus-text scans stay fused to the section minimum") {
    // q98's sections each re-scan `documents` (union branches share no
    // subtrees), so the text-reading scan count IS the corpus cost at
    // 100 TB. The fused spelling pays exactly 4 in-plan text scans
    // (volume, dedup+quality, leak audit, and the repetition section as
    // ONE map-side kernel projection) — the vocab sections read a
    // materialized wordCounts instead of tokenizing the corpus three more
    // times, and the n_chars histogram prunes text away entirely. A 5th
    // text scan means a section decomposed back into per-metric passes.
    val p = plan(SparkEntry.queries("q98_corpus_datasheet")(spark, sfDir))
    val n = """ReadSchema: [^\n]*\btext\b""".r.findAllIn(p).size
    assert(n == 4, s"expected 4 text-reading scans, got $n:\n$p")
    assert("""ReadSchema: struct<n_chars:bigint>""".r.findAllIn(p).size == 1,
      s"length section must prune to n_chars only:\n$p")
  }

  // walk an executed plan, unwrapping AQE wrappers (the Bridge
  // compileWholeStageCodegen discipline), yielding every physical node
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case _ => p.children.flatMap(allNodes)
    })
  }

  test("ABC classification: two-phase global rank — no single-partition exchange anywhere") {
    val df = SparkEntry.queries("q216_abc_parts")(spark, sfDir)
    val p = plan(df)
    // the entity frame (scales with the corpus) must never funnel through
    // one task: no SinglePartition exchange, and every window partitioned
    assert(!p.contains("SinglePartition"), p)
    df.collect()
    val wins = allNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      wins.map(_.partitionSpec).mkString("; "))
  }

  test("attention audit: cumsum window present and partitioned, no single-partition corpus sort") {
    // q245 rides two Ids.globalIndex range sorts, q246 one globalRankCumsum;
    // both frames scale with the corpus, so an unpartitioned window or a
    // missing range exchange (= the order funnelled through one task) is
    // the q216-class scale killer. The 1-row grand-total rollups at the
    // top legitimately gather bounded partials into a SinglePartition
    // exchange — that is the standard final-aggregate shape, not a funnel,
    // so the assertion targets the order/window machinery, not the plan
    // string.
    // (The range-partitioned phase-1 sort runs EAGERLY inside
    // globalIndex/globalRankCumsum — toRdd is pinned before this plan is
    // built, so it cannot appear in the executed plan; IdsSpec and
    // PropertySpec prove that phase at random partition counts. q245 uses
    // globalIndex, which plans NO window at all — there is nothing
    // in-plan to assert for it, so the window check targets q246's
    // cumsum window and must find it (a vacuous forall would go green if
    // a re-spelling silently dropped the pid window).)
    val df = SparkEntry.queries("q246_attention_cost")(spark, sfDir)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    val wins = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the pid-partitioned cumsum window")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      wins.map(_.partitionSpec).mkString("; "))
    // no corpus-frame sort runs on a single partition: every SortExec
    // below the first aggregation keeps a non-single child partitioning
    val aggFree = nodes.collect {
      case s: org.apache.spark.sql.execution.SortExec
          if s.find(_.isInstanceOf[
            org.apache.spark.sql.execution.aggregate.BaseAggregateExec]).isEmpty =>
        s.child.outputPartitioning
    }
    assert(aggFree.forall(_ !=
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition),
      aggFree.mkString("; "))
  }

  test("RFM quintiles: histogram-cutoff buckets — every window partitioned, cutoffs broadcast") {
    val df = SparkEntry.queries("q206_rfm_segments")(spark, sfDir)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    val wins = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the per-user frame scales with the event log: only pid-partitioned
    // running-count windows are allowed (the old spelling had three
    // unpartitioned ntile windows = three single-task sorts)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      wins.map(_.partitionSpec).mkString("; "))
    val p = plan(df)
    assert(!p.contains("ntile("), p)
    // round-14 rankBuckets: cutoffs are collected as driver literals
    // (≤ k−1 scalars per metric), so the assignment is a plain projection
    // — no 1-row cutoff frame left to join at all
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}

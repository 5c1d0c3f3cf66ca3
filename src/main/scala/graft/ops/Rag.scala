package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RAG context retrieval — the reference's serving-side composition
  * (reference: PLATFORM-GenerationLLM.py:126-172 / app2.py:47-67): embed
  * the question, top-1 vector search with a score threshold, expand to the
  * hit's co-cluster neighbors, fetch the context documents.
  *
  * The whole flow is ONE composed DataFrame query (O10 → J3 → J2), so
  * Catalyst plans it end to end: the top-1 search is a TakeOrderedAndProject
  * over the index scan, the expansions are broadcast joins of one-row /
  * cap-row sets — the corpus is never shuffled.
  */
object Rag {

  /** Context documents for a single query vector.
    *
    * @param index     (idCol, vecCol, clusterCol) vector-index table
    * @param documents doc table whose `docIdCol` matches index ids
    * @param queryVec  1-row DataFrame with column `qvec`
    * @param threshold minimum cosine similarity for the top-1 hit
    * @param cap       max co-cluster neighbors (reference caps at 20)
    * @param noiseLabel when the index carries density-cluster labels with a
    *                   noise marker (reference HDBSCAN: −1), pass it here so
    *                   a noise hit expands to NO neighbors — mirroring the
    *                   reference's empty `posts_similaires` for noise rows
    *                   (PLATFORM-contextual-Chunking.py:97-114) instead of
    *                   treating noise as one giant cluster
    * @return documents of {hit} ∪ {≤cap smallest-id co-cluster members}
    */
  def contextDocs(index: DataFrame, idCol: String, vecCol: String, clusterCol: String,
      documents: DataFrame, docIdCol: String,
      queryVec: DataFrame, threshold: Double, cap: Int,
      noiseLabel: Option[Long] = None): DataFrame = {
    val top1 = Similarity.cosineTopK(index, idCol, vecCol, queryVec, "qvec", 1, threshold)
    val hit = index.join(broadcast(top1.select(col(idCol))), Seq(idCol))
      .select(col(idCol).as("__qid"), col(clusterCol).as("__qcluster"))
    val sameCluster = index(clusterCol) === col("__qcluster") && index(idCol) =!= col("__qid")
    val expandable = noiseLabel.fold(sameCluster)(n => sameCluster && index(clusterCol) =!= lit(n))
    val neighbors = index.join(broadcast(hit), expandable)
      .select(col(idCol)).orderBy(col(idCol)).limit(cap)
    val contextIds = top1.select(col(idCol)).union(neighbors)
    documents.join(broadcast(contextIds.withColumnRenamed(idCol, docIdCol)),
      Seq(docIdCol), "left_semi")
  }

  /** Final prompt assembly (reference: PLATFORM-GenerationLLM.py:183-215 /
    * app2.py:166-178): context bodies + optional dialogue history + the
    * question, folded into one prompt string. Context is ordered by id so
    * the output is deterministic; the aggregation is a single-row reduce
    * of an already-bounded context set (≤ 1 + cap rows), so the "collect"
    * the reference does on the driver is here one tiny aggregated row.
    * The LLM call itself stays an external sink consuming this column. */
  def assemblePrompt(contextDocs: DataFrame, docIdCol: String, textCol: String,
      question: String, history: Seq[String] = Nil): DataFrame = {
    val historyBlock =
      if (history.isEmpty) "" else history.mkString("", "\n", "\n\n")
    contextDocs
      .select(col(docIdCol), col(textCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(docIdCol), col(textCol)))),
          p => p.getField(textCol)),
        "\n---\n").as("context"))
      .select(concat(
        lit("Context:\n"), col("context"),
        lit("\n\n"), lit(historyBlock),
        lit("Question: "), lit(question)).as("prompt"))
  }

  /** Batch-mode [[assemblePrompt]]: one prompt PER QUERY from a ranked
    * context frame — the shape an offline RAG evaluation run needs
    * (thousands of questions prompted in one plan, not a driver loop).
    * Context passages join in rank order; the question text rides in as
    * a column. Output: (queryIdCol, n_passages, prompt). */
  def assemblePrompts(ctx: DataFrame, queryIdCol: String, rankCol: String,
      textCol: String, questionCol: String): DataFrame =
    ctx.groupBy(col(queryIdCol))
      .agg(
        count(lit(1)).as("n_passages"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(rankCol), col(textCol)))),
            p => p.getField(textCol)),
          "\n---\n").as("__context"),
        first(col(questionCol)).as("__q"))
      .select(col(queryIdCol), col("n_passages"),
        concat(lit("Context:\n"), col("__context"),
          lit("\n\nQuestion: "), col("__q")).as("prompt"))

  /** Serving-loop conversation state (reference: app.py:150-159 seeds
    * `dialogue_history` per session; app.py:77-91 folds it into the prompt
    * as "\nUser: q\nAssistant: r" blocks before the current question).
    *
    * The dialogue lives in a DataFrame keyed by a turn ordinal — session
    * state as a TABLE, not driver-side mutable state — so history can come
    * from anywhere (a parquet log, a streaming sink, an in-memory relation)
    * and the fold is one single-row aggregate over an already-bounded
    * dialogue. Turns are sorted by the ordinal inside the aggregate, so the
    * fold is deterministic under any partitioning. An empty history folds
    * to an empty dialogue block, exactly like the reference's
    * `history=None` branch. */
  def sessionPrompt(history: DataFrame, turnCol: String, questionCol: String,
      responseCol: String, comments: String, question: String): DataFrame =
    history
      .select(col(turnCol), col(questionCol), col(responseCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(turnCol), col(questionCol), col(responseCol)))),
          t => concat(lit("\nUser: "), t.getField(questionCol),
                      lit("\nAssistant: "), t.getField(responseCol))),
        "").as("dialogue"))
      .select(concat(
        lit("You are a helpful assistant. You must base your answers **only** on the comments below.\n"),
        lit("Here are some relevant comments:\n"),
        lit(comments), lit("\n\n"),
        col("dialogue"), lit("\n"),
        lit("User: "), lit(question), lit("\nAssistant:")).as("prompt"))

  /** The distinct word-n-gram support join behind the groundedness family:
    * (query, span) of the answer matched against (query, doc, span) of
    * that query's context — every frame here is SHORTLIST-sized (answers
    * and the ≤k context docs per query), so the joins never touch the
    * corpus; the corpus-scale work happened in whatever retrieval built
    * `context`. Spans are the [[graft.expr.ShingleKernels.wordSpans]]
    * positional n-grams made DISTINCT (support is set membership).
    *
    * Returns (spans, hits): `spans` is one row per `answers` row with the
    * distinct-span ARRAY (zero-span answers keep their row — the audit's
    * "every answers row emits one" contract needs them), `hits` the
    * exploded support join. The span kernel runs ONCE, on the pinned
    * `spans` frame — both the per-query totals and the join side read the
    * pin (the r14 spelling evaluated wordSpans(answers) twice). */
  private def spanHits(answers: DataFrame, queryIdCol: String,
      answerCol: String, context: DataFrame, ctxDocCol: String,
      ctxTextCol: String, n: Int): (DataFrame, DataFrame) = {
    val spans = answers.select(col(queryIdCol),
        array_distinct(graft.expr.TextExprs.wordSpans(col(answerCol), n))
          .as("__spans"))
      .localCheckpoint(false)
    val aSpans = spans.select(col(queryIdCol),
      explode(col("__spans")).as("__span"))
    val cSpans = context.select(col(queryIdCol), col(ctxDocCol),
        explode(array_distinct(
          graft.expr.TextExprs.wordSpans(col(ctxTextCol), n))).as("__span"))
    // hits feeds the support rollup AND the per-doc attribution — pinned,
    // or the span join (and everything upstream of `answers`) runs once
    // per consumer (Catalyst shares no subtrees across branches)
    (spans, aSpans.join(cSpans, Seq(queryIdCol, "__span"))
      .localCheckpoint(false))
  }

  /** The groundedness pair reports `top_doc` in the ID DOMAIN with −1 as
    * the "nothing supported" sentinel — that sentinel only exists for
    * integral ids, and a silent long-cast of a string id column would
    * coalesce real support onto the sentinel (ADVICE r14). Loud contract
    * instead: map string ids to a numeric surrogate upstream. */
  private def requireIntegralDocId(context: DataFrame, ctxDocCol: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = context.schema(ctxDocCol).dataType
    require(Set[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(dt),
      s"groundedness ops need an integral context doc-id column (top_doc's " +
        s"-1 no-support sentinel lives in the id domain); got $dt for " +
        s"'$ctxDocCol' - map string ids to a numeric surrogate first")
  }

  /** GROUNDEDNESS audit of generated answers against their retrieval
    * context — the RAG-serving governance number: which share of an
    * answer's word n-grams is SUPPORTED (appears verbatim in at least one
    * context document), and which single document carries the most
    * support. `unsupported_ppm` is the extractive-hallucination proxy a
    * serving stack alerts on; `top_doc`/`top_share_ppm` is the citation
    * the answer should carry. Answers shorter than `n` tokens have no
    * spans — all-zero row, 0 ppm by convention (nothing to ground).
    *
    * Output per query (every `answers` row emits one): (queryIdCol,
    * n_spans, n_supported, unsupported_ppm, top_doc, top_share_ppm) with
    * top_doc = −1 when nothing is supported (the noise-label convention).
    * Integer-exact; ties on the top document break to the smallest id.
    *
    * Scale shape: all joins are (query × answer-spans) vs (query × k
    * context docs × their spans) — shortlist-sized; one window
    * partitioned by the query over the ≤k-row per-doc counts. */
  def groundednessAudit(answers: DataFrame, queryIdCol: String,
      answerCol: String, context: DataFrame, ctxDocCol: String,
      ctxTextCol: String, n: Int): DataFrame = {
    require(n >= 1, s"span size must be >= 1, got $n")
    requireIntegralDocId(context, ctxDocCol)
    import org.apache.spark.sql.expressions.Window
    val (spans, hits) = spanHits(answers, queryIdCol, answerCol,
      context, ctxDocCol, ctxTextCol, n)
    val totals = spans.select(col(queryIdCol),
      size(col("__spans")).cast("long").as("n_spans"))
    val supported = hits.select(col(queryIdCol), col("__span")).distinct()
      .groupBy(col(queryIdCol)).agg(count(lit(1)).as("n_supported"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__hits").desc, col(ctxDocCol).asc)
    val top = hits.groupBy(col(queryIdCol), col(ctxDocCol))
      .agg(count(lit(1)).as("__hits"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col(queryIdCol), col(ctxDocCol).as("top_doc"),
        col("__hits").as("__top_hits"))
    totals
      .join(supported, Seq(queryIdCol), "left")
      .join(top, Seq(queryIdCol), "left")
      .select(col(queryIdCol), col("n_spans"),
        coalesce(col("n_supported"), lit(0L)).as("n_supported"),
        when(col("n_spans") > 0L,
          expr("(n_spans - coalesce(n_supported, 0L)) * 1000000L div n_spans"))
          .otherwise(lit(0L)).cast("long").as("unsupported_ppm"),
        coalesce(col("top_doc").cast("long"), lit(-1L)).as("top_doc"),
        when(coalesce(col("n_supported"), lit(0L)) > 0L,
          expr("__top_hits * 1000000L div n_supported"))
          .otherwise(lit(0L)).cast("long").as("top_share_ppm"))
  }

  /** Span-size SWEEP of [[groundednessAudit]]'s corpus-level rollup: the
    * supported/unsupported split at every n in `ns`, in ONE plan — the
    * q196 tier-sweep lesson applied to groundedness (how does the
    * extractive-hallucination ppm move with span size? small n is
    * lenient, large n strict; the sweep shows where the curve knees).
    * The answer/context frames are tokenized ONCE per row; the per-n
    * spans are a map-side explode over the (driver-literal, bounded)
    * size list — no per-n re-scan. All frames are shortlist-sized (the
    * corpus work happened in the retrieval that built `context`), so the
    * interpreted HOF span spelling is fine here — unlike the corpus-side
    * kernels, there is no hot path.
    *
    * The context doc identity is deliberately NOT a parameter (unlike
    * [[groundednessAudit]]): support is membership in ANY of the query's
    * context rows, so only (queryIdCol, ctxTextCol) participate.
    *
    * Output one row per n: (n, n_answers, n_spans, n_supported,
    * unsupported_ppm), spans distinct per (query, n), support = the span
    * appears in ANY of that query's context docs, unsupported_ppm =
    * (n_spans − n_supported)·1e6 div n_spans (0 when no spans).
    * Tokenization matches [[graft.expr.ShingleKernels.wordSpans]]:
    * split(lower(trim(x)), \\s+), no empty-token filter. */
  def groundednessSweep(answers: DataFrame, queryIdCol: String,
      answerCol: String, context: DataFrame,
      ctxTextCol: String, ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1),
      s"span sizes must be non-empty and >= 1, got $ns")
    val sizes = ns.distinct.sorted
    // per-n distinct-span arrays from one tokenization: [(n, spans)]
    def nSpanStructs(textCol: Column): Column = {
      val toks = graft.functions.TextFns.wordTokens(textCol)
      transform(typedLit(sizes), n => struct(n.cast("long").as("n"),
        when(size(toks) >= n, array_distinct(transform(
            sequence(lit(1), size(toks) - n + 1),
            i => array_join(slice(toks, i, n), " "))))
          .otherwise(array().cast("array<string>")).as("spans")))
    }
    // zero-span (q, n) rows survive as empty arrays — totals must count
    // every answer at every n, the groundednessAudit row contract
    val aArr = answers.select(col(queryIdCol),
        explode(nSpanStructs(col(answerCol))).as("__ns"))
      .select(col(queryIdCol), col("__ns.n").as("n"),
        col("__ns.spans").as("__spans"))
      .localCheckpoint(false)
    val totals = aArr.groupBy(col("n")).agg(
      count(lit(1)).as("n_answers"),
      coalesce(sum(size(col("__spans")).cast("long")), lit(0L)).as("n_spans"))
    val aSpans = aArr.select(col(queryIdCol), col("n"),
      explode(col("__spans")).as("__span"))
    val cSpans = context.select(col(queryIdCol),
        explode(nSpanStructs(col(ctxTextCol))).as("__ns"))
      .select(col(queryIdCol), col("__ns.n").as("n"),
        explode(col("__ns.spans")).as("__span"))
      .distinct() // membership in ANY context doc — drop the doc dimension
    val supported = aSpans.join(cSpans, Seq(queryIdCol, "n", "__span"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_supported"))
    totals
      .join(supported, Seq("n"), "left")
      .select(col("n"), col("n_answers"), col("n_spans"),
        coalesce(col("n_supported"), lit(0L)).as("n_supported"),
        when(col("n_spans") > 0L,
          expr("(n_spans - coalesce(n_supported, 0L)) * 1000000L div n_spans"))
          .otherwise(lit(0L)).cast("long").as("unsupported_ppm"))
  }

  /** The citation-level view of [[groundednessAudit]]: one row per
    * (query, context doc) with that document's share of the supported
    * answer spans — the attribution table a serving UI renders as
    * citations. Context docs supporting nothing are kept (0 hits) so the
    * table always shows the full retrieved set. Output: (queryIdCol,
    * ctxDocCol, n_hits, share_ppm), share over the query's supported
    * spans (a span counted once per doc CONTAINING it — shares can sum
    * past 1e6 when spans appear in several docs, which is the point:
    * redundant support is visible). */
  def attributionTable(answers: DataFrame, queryIdCol: String,
      answerCol: String, context: DataFrame, ctxDocCol: String,
      ctxTextCol: String, n: Int): DataFrame = {
    require(n >= 1, s"span size must be >= 1, got $n")
    requireIntegralDocId(context, ctxDocCol)
    val (_, hits) = spanHits(answers, queryIdCol, answerCol,
      context, ctxDocCol, ctxTextCol, n)
    val supported = hits.select(col(queryIdCol), col("__span")).distinct()
      .groupBy(col(queryIdCol)).agg(count(lit(1)).as("__n_supported"))
    val perDoc = hits.groupBy(col(queryIdCol), col(ctxDocCol))
      .agg(count(lit(1)).as("n_hits"))
    context.select(col(queryIdCol), col(ctxDocCol)).distinct()
      .join(perDoc, Seq(queryIdCol, ctxDocCol), "left")
      .join(supported, Seq(queryIdCol), "left")
      .select(col(queryIdCol), col(ctxDocCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("__n_supported"), lit(0L)) > 0L,
          expr("coalesce(n_hits, 0L) * 1000000L div __n_supported"))
          .otherwise(lit(0L)).cast("long").as("share_ppm"))
  }
}

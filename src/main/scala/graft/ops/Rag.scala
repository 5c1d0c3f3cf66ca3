package graft.ops

import org.apache.spark.sql.DataFrame
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
}

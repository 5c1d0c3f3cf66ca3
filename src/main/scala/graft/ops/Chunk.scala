package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping text chunking — the north-star RAG extension
  * (SURVEY.md §7.2 M6): one row per chunk, generated with
  * `explode(sequence(...))` + `substr`, so the whole expansion is
  * codegen'd and fully distributed (no driver loop, no UDTF).
  */
object Chunk {

  /** Split `textCol` into chunks of `size` chars starting every `step`
    * chars (overlap = size - step). Emits (id, chunk_id, chunk_start,
    * chunk); empty text yields one empty chunk. Trailing chunks may be
    * shorter than `size`, matching substr semantics in every engine. */
  def charChunks(df: DataFrame, idCol: String, textCol: String,
      size: Int, step: Int): DataFrame = {
    require(size > 0 && step > 0, "size and step must be positive")
    df.select(col(idCol), col(textCol))
      .withColumn("chunk_start",
        explode(sequence(lit(1), greatest(length(col(textCol)), lit(1)), lit(step))))
      .select(
        col(idCol),
        ((col("chunk_start") - 1) / step).cast("long").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        col(textCol).substr(col("chunk_start"), lit(size)).as("chunk"))
  }

  /** Sentence-aware chunking — the RAG passage unit that never cuts a
    * sentence in half: split on terminator boundaries (runs of
    * `[^.!?]+` with their trailing terminators — no lookbehind, so the
    * same RE2-safe pattern runs in any engine), then pack consecutive
    * sentences into chunks by the offset-division rule (`chunk_id =
    * (cum_tokens − n_tok) div maxTokens`, the q62 packing convention):
    * a sentence longer than `maxTokens` still lands whole in one chunk
    * — passage integrity beats the cap, and the fill report downstream
    * sees the overflow.
    *
    * Scale shape: one extract + posexplode of the corpus text, one
    * per-document window (partitioned by the id — parallel across
    * documents), one hash aggregation; the chunk text reassembles with
    * a sorted in-group collect (the A1 discipline). Output: (id,
    * chunk_id, chunk, n_sentences, n_tokens). */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val sent = df
      .select(col(idCol), posexplode(expr(
        s"regexp_extract_all($textCol, '[^.!?]+[.!?]*', 0)")).as(Seq("pos", "s")))
      .select(col(idCol), col("pos"), trim(col("s")).as("s"))
      .filter(col("s") =!= "")
      .withColumn("n_tok",
        org.apache.spark.sql.functions.size(split(col("s"), "\\s+")).cast("long"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sent
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("chunk_id", expr(s"(cum - n_tok) div ${maxTokens}L"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          x => x.getField("s")), " ").as("chunk"),
        count(lit(1)).as("n_sentences"),
        sum(col("n_tok")).as("n_tokens"))
  }

  /** Token-based overlapping chunks: windows of `size` whitespace tokens
    * starting every `step` tokens, re-joined with single spaces (the usual
    * RAG chunking unit). Same codegen'd explode/slice shape as
    * [[charChunks]]; blank text yields one empty chunk. */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
      size: Int, step: Int): DataFrame = {
    require(size > 0 && step > 0, "size and step must be positive")
    val toks = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol), toks.as("__toks"))
      .withColumn("tok_start",
        explode(sequence(lit(1),
          greatest(org.apache.spark.sql.functions.size(col("__toks")), lit(1)), lit(step))))
      .select(
        col(idCol),
        ((col("tok_start") - 1) / step).cast("long").as("chunk_id"),
        col("tok_start").cast("long").as("tok_start"),
        array_join(slice(col("__toks"), col("tok_start"), lit(size)), " ").as("chunk"))
  }
}

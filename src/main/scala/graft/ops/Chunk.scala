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

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Training-example SYNTHESIS — the transforms that turn a cleaned corpus
  * into self-supervised objectives beyond plain next-token prediction:
  * fill-in-the-middle reordering (Bavarian et al. 2022 — how code models
  * learn infilling) and T5-style span corruption (Raffel et al. 2020 —
  * the denoising objective). Both are deterministic here: cut points and
  * span offsets derive from multiplicative integer hashes of the document
  * id, not an RNG, so the same examples regenerate on every engine and
  * every rerun (the [[Mixture]] md5-order convention, arithmetic-only).
  *
  * Scale shape: both transforms are per-row projections (FIM) or one
  * explode + one keyed aggregation (span corruption) — embarrassingly
  * parallel, no joins, no windows over the corpus.
  */
object Synthesize {

  private val K1 = 2654435761L // Knuth multiplicative constants
  private val K2 = 40503L

  /** Fill-in-the-middle: for gated documents (id % 2 = 0), split the text
    * at two hash-derived cut points and render PSM order
    * (`<PRE>prefix<SUF>suffix<MID>middle`); the rest pass through raw —
    * the FIM-rate mix every code-LLM data pipeline ships. Documents
    * shorter than 3 characters stay raw (no room for three parts).
    *
    * Output: id, `mode` ('psm' | 'raw'), the three segment lengths, and
    * the rendered training string. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val t = col(textCol)
    val n = length(t).cast("long")
    val gated = id % 2 === 0 && n >= 3L
    // reduce the id before the Knuth multiply: ids can carry large scale
    // offsets (the GenScale copy space reaches 6e9+), and 6e9 · K1
    // overflows BIGINT — id % P first keeps the product < 2.7e18
    val idm = id % 1000000007L
    val c1 = lit(1L) + (idm * K1) % (n - 1L)
    val c2 = lit(1L) + (idm * K2) % (n - 1L)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val prefix = t.substr(lit(1), lo.cast("int"))
    val middle = t.substr((lo + 1L).cast("int"), (hi - lo).cast("int"))
    val suffix = t.substr((hi + 1L).cast("int"), (n - hi).cast("int"))
    df.select(id,
      when(gated, lit("psm")).otherwise(lit("raw")).as("mode"),
      when(gated, lo).otherwise(n).as("n_prefix"),
      when(gated, hi - lo).otherwise(0L).as("n_middle"),
      when(gated, n - hi).otherwise(0L).as("n_suffix"),
      when(gated, concat(lit("<PRE>"), prefix, lit("<SUF>"), suffix,
        lit("<MID>"), middle)).otherwise(t).as("rendered"))
  }

  /** T5 span corruption: tokens partition into fixed windows of
    * `window`; each window drops a `spanLen`-token run starting at a
    * hash-derived in-window offset (bounded by `window − spanLen`, so
    * spans never cross windows or overlap). The INPUT replaces each
    * dropped run with its window's sentinel `<X{w}>`; the TARGET is the
    * sentinel-prefixed concatenation of the dropped runs in order —
    * exactly the T5 denoising pair.
    *
    * Output per document: token totals and the (input_text, target_text)
    * pair; documents with no tokens emit empty strings (not NULLs).
    *
    * Scale shape: one explode over the token stream, flags and sentinels
    * computed positionally map-side, then ONE hash aggregation per doc
    * with sorted in-group collects (the A1 discipline). */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      window: Int = 10, spanLen: Int = 3): DataFrame = {
    require(window > spanLen && spanLen >= 1)
    val slots = window - spanLen + 1
    val toks = df.select(col(idCol),
      posexplode(filter(TextFns.wordTokens(col(textCol)), t => t =!= ""))
        .as(Seq("pos", "tok")))
    val widx = expr(s"CAST(pos div $window AS BIGINT)")
    val off = (col(idCol) + widx * K1) % slots
    val inWin = col("pos") % window
    val corrupted = inWin >= off && inWin < off + spanLen
    val sentinel = concat(lit("<X"), widx.cast("string"), lit(">"))
    val marked = toks
      .withColumn("__w", widx)
      .withColumn("__corr", corrupted)
      .withColumn("__first", corrupted && inWin === off)
    // input: kept tokens, plus one sentinel at each span's first position
    val inputPiece = when(!col("__corr"), col("tok"))
      .when(col("__first"), sentinel)
    // target: at a span's first position the sentinel marks the run
    val targetPiece = when(col("__corr"),
      when(col("__first"), concat(sentinel, lit(" "), col("tok")))
        .otherwise(col("tok")))
    val agg = marked.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("__corr"), 1L).otherwise(0L)).as("n_corrupted"),
      array_join(transform(array_sort(collect_list(
          when(inputPiece.isNotNull, struct(col("pos"), inputPiece.as("p"))))),
        x => x.getField("p")), " ").as("input_text"),
      array_join(transform(array_sort(collect_list(
          when(targetPiece.isNotNull, struct(col("pos"), targetPiece.as("p"))))),
        x => x.getField("p")), " ").as("target_text"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_corrupted"), lit(0L)).as("n_corrupted"),
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"))
  }
}

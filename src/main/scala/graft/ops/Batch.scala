package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-assembly efficiency — the serving/training step AFTER the mix is
  * fixed: how examples are grouped into fixed-size batches (or packed into
  * fixed-length sequences) decides how much compute is spent on padding and
  * on needless attention, and at 100 TB the difference between a naive and
  * a length-aware policy is a double-digit share of the training bill.
  * The reference pipeline stops at the export (SURVEY.md §2.8); these
  * audits quantify the two classic decisions a consumer of that export
  * makes: length-bucketed batching vs shuffle-order batching
  * ([[paddingWaste]]) and full-block vs document-masked attention over
  * packed sequences ([[attentionCost]]).
  *
  * Both ride [[Ids.globalIndex]] / [[Ids.globalRankCumsum]] for their
  * global orders — a `row_number()` over an unpartitioned window would
  * funnel the corpus through one task (the single-reducer trap every
  * global-order op in this repo avoids).
  */
object Batch {

  /** Padding-waste A/B of two batch-assembly policies at a fixed batch
    * size B (one row per policy):
    *
    *  - `sorted`  — examples ordered by (length, id) and cut into
    *    consecutive batches of B: the length-bucketed loader.
    *  - `random`  — examples ordered by (md5(id), id): the deterministic
    *    stand-in for shuffle-order batching (the default loader).
    *
    * Each batch pads every member to the batch max, so its waste is
    * `count·max(len) − sum(len)` (the trailing partial batch pads to its
    * own max over its own count — no phantom rows). Output per policy:
    * (policy, n_batches, n_tokens, pad_tokens, pad_ppm) with
    * `pad_ppm = pad·1e6 div (pad + tokens)` — the padded-compute share —
    * branched on the 9 223 372 036 854 overflow bound (the lorenz/ABC
    * rule: above it, divide the downscaled denominator).
    *
    * Sorted-contiguous grouping is OPTIMAL among all assignments into
    * groups of ≤ B (exchange argument: swapping any two members across
    * batches toward sorted order never raises either batch max), so
    * `sorted.pad_tokens <= random.pad_tokens` always — PropertySpec
    * asserts it on random frames.
    *
    * Scale shape: two range-partition sorts (one per policy — the cost
    * any global order pays), batch ids as codegen'd projections off the
    * two-phase index, one map-combined aggregation per policy down to
    * |batches| rows, then a 1-row rollup each. No single-partition
    * exchange, no collect. `lenCol` must be LongType non-negative.
    * The zeroed empty-input report is an ENGINE convention (Wave37Spec
    * pins it); the registered oracles assume non-empty fixture tables —
    * DuckDB's aggregate-over-nothing chains return no rows / NULLs
    * there, a divergence that exists only on inputs the driver never
    * compares. */
  def paddingWaste(df: DataFrame, idCol: String, lenCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val base = df.select(col(idCol), col(lenCol))
    def onePolicy(name: String,
        order: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val ranked = Ids.globalIndex(base, order, "__rk")
      ranked
        .withColumn("__batch", expr(s"__rk div ${batchSize}L"))
        .groupBy(col("__batch"))
        .agg(count(lit(1)).as("__n"), max(col(lenCol)).as("__mx"),
          sum(col(lenCol)).as("__s"))
        .agg(count(lit(1)).as("n_batches"),
          coalesce(sum(col("__s")), lit(0L)).cast("long").as("n_tokens"),
          coalesce(sum(col("__n") * col("__mx") - col("__s")), lit(0L))
            .cast("long").as("pad_tokens"))
        .select(lit(name).as("policy"), col("n_batches"), col("n_tokens"),
          col("pad_tokens"),
          expr("""CASE WHEN pad_tokens + n_tokens <= 0L THEN 0L
                 |     WHEN pad_tokens + n_tokens <= 9223372036854L
                 |       THEN pad_tokens * 1000000L div (pad_tokens + n_tokens)
                 |     ELSE pad_tokens div ((pad_tokens + n_tokens) div 1000000L)
                 |END""".stripMargin).cast("long").as("pad_ppm"))
    }
    onePolicy("random",
        Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc))
      .unionByName(onePolicy("sorted",
        Seq(col(lenCol).asc, col(idCol).asc)))
  }

  /** Attention-cost audit of fixed-length sequence packing: examples are
    * packed in deterministic loader order (md5(id), id — the epoch-shuffle
    * key convention) into `seqLen`-token bins by the q62 offset-division
    * rule (`bin = (cum − len) div seqLen`; an over-long example lands
    * whole in the bin its start offset picks, same as
    * [[Chunk.sentenceChunks]]), and the audit compares the two attention
    * regimes over the packed windows:
    *
    *  - `masked_cost` = Σ_examples len² — document-masked (block-diagonal)
    *    attention, what FlashAttention-style varlen kernels execute;
    *  - `naive_cost`  = Σ_bins (bin_len)² — full-window attention, what a
    *    packer without document masks pays (and what lets examples attend
    *    across document boundaries).
    *
    * One output row: (seq_len, n_bins, n_tokens, masked_cost, naive_cost,
    * savings_ppm) where savings_ppm = (naive − masked)·1e6 div naive,
    * branched on the overflow bound. masked ≤ naive always (bins partition
    * the examples and (Σx)² ≥ Σx² for non-negative x).
    *
    * Scale shape: one two-phase rank/cumsum (range shuffle + pid-window —
    * no single-partition exchange), one map-combined per-bin aggregation,
    * one 1-row rollup. The per-example len² products stay in int64 under
    * ANSI (loud on overflow); a 100 TB corpus at 4k-token sequences sums
    * naive_cost ≈ tokens·seqLen ≈ 1e17 — inside the bound. `lenCol` must
    * be LongType with values ≥ 1 (zero-length rows would share a start
    * offset with their successor; filter them upstream). */
  def attentionCost(df: DataFrame, idCol: String, lenCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    // the caller's length column is re-aliased to an internal name up
    // front so no expr() string ever interpolates a caller-supplied
    // identifier (ADVICE r14: a name needing backticks would mis-parse)
    val base = df.select(col(idCol), col(lenCol).as("__len"))
    val (ranked, _, _) = Ids.globalRankCumsum(base,
      Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc),
      "__len", rankOut = "__rk", cumOut = "__cum")
    ranked
      .withColumn("__bin", expr(s"(__cum - __len) div ${seqLen}L"))
      .groupBy(col("__bin"))
      .agg(sum(col("__len")).as("__blen"),
        sum(col("__len") * col("__len")).as("__bmask"))
      .agg(count(lit(1)).as("n_bins"),
        coalesce(sum(col("__blen")), lit(0L)).cast("long").as("n_tokens"),
        coalesce(sum(col("__bmask")), lit(0L)).cast("long").as("masked_cost"),
        coalesce(sum(col("__blen") * col("__blen")), lit(0L)).cast("long")
          .as("naive_cost"))
      .select(lit(seqLen.toLong).as("seq_len"), col("n_bins"),
        col("n_tokens"), col("masked_cost"), col("naive_cost"),
        expr("""CASE WHEN naive_cost <= 0L THEN 0L
               |     WHEN naive_cost <= 9223372036854L
               |       THEN (naive_cost - masked_cost) * 1000000L div naive_cost
               |     ELSE (naive_cost - masked_cost) div (naive_cost div 1000000L)
               |END""".stripMargin).cast("long").as("savings_ppm"))
  }
}

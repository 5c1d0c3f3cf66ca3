package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning data preparation — the step between a cleaned
  * conversation corpus (the reference's Q&A pairs are exactly this) and a
  * trainable example: render each conversation to one training string
  * under a chat template, and emit the ASSISTANT character spans a loss
  * mask needs (SFT computes loss only on assistant tokens; everything
  * else is context). Offsets are exact integers computed in-plan, so the
  * artifact is engine-checkable end to end — no tokenizer in the loop
  * (char spans convert to token spans downstream via q125's encoder).
  */
object Sft {

  /** Render `turns(convIdCol, turnCol, roleCol, textCol)` to one row per
    * conversation under the template
    * `<|role|>\n{text}\n` per turn, turns in `turnCol` order:
    *
    *   - `rendered` — the concatenated training string;
    *   - `assistant_spans` — "start-end" 1-based inclusive character
    *     spans of each assistant turn's TEXT (not its header), joined
    *     with "," in turn order — exactly the mask a trainer applies
    *     ("" when a conversation has no assistant turn; an empty
    *     assistant text yields the degenerate span start-(start−1)).
    *
    * Scale shape: one per-conversation window cumsum over block lengths
    * (parallel across conversations), one hash aggregation with sorted
    * in-group collects (the A1 discipline) — conversations never leave
    * their partition, and the corpus text is touched once. */
  def renderConversations(turns: DataFrame, convIdCol: String,
      turnCol: String, roleCol: String, textCol: String): DataFrame = {
    val hdr = concat(lit("<|"), col(roleCol), lit("|>\n"))
    val w = Window.partitionBy(col(convIdCol)).orderBy(col(turnCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = turns
      .select(col(convIdCol), col(turnCol), col(roleCol), col(textCol))
      .withColumn("__hlen", length(hdr).cast("long"))
      .withColumn("__block", concat(hdr, col(textCol), lit("\n")))
      .withColumn("__blen", length(col("__block")).cast("long"))
      .withColumn("__cum", sum(col("__blen")).over(w))
      .withColumn("__ts", col("__cum") - col("__blen") + col("__hlen") + 1L)
      .withColumn("__te",
        col("__cum") - col("__blen") + col("__hlen") + length(col(textCol)))
    t.groupBy(col(convIdCol))
      .agg(
        count(lit(1)).as("n_turns"),
        count(when(col(roleCol) === "assistant", 1)).as("n_assistant_turns"),
        array_join(
          transform(array_sort(collect_list(struct(col(turnCol), col("__block")))),
            x => x.getField("__block")), "").as("rendered"),
        array_join(
          transform(
            array_sort(collect_list(when(col(roleCol) === "assistant",
              struct(col(turnCol),
                concat(col("__ts").cast("string"), lit("-"),
                  col("__te").cast("string")).as("__sp"))))),
            x => x.getField("__sp")), ",").as("assistant_spans"))
  }

  /** Prefix-cache savings report — the capacity-planning table a serving
    * fleet with radix-prefix caching (vLLM-style automatic prefix reuse)
    * reads: per route (a template / system-prompt family), how many
    * prompts share how long a common prefix, and what fraction of prompt
    * characters the cache absorbs.
    *
    * The route's shared prefix is the longest common prefix of ALL its
    * prompts, computed as `LCP(min(prompt), max(prompt))` — the sorted-
    * extremes identity (any divergence inside the set widens the
    * min/max gap at least as much), so the whole report is ONE hash
    * aggregation over the prompt log (min/max/count/sum, all map-side
    * combined) followed by per-ROUTE scalar work on the ≤|routes|-row
    * frame. The per-route LCP scan uses an interpreted HOF — bounded by
    * route count, never prompt count, so it stays off the hot path.
    *
    * `saved_chars = (n_prompts − 1) · lcp_chars` — every prompt after the
    * first reads its prefix from cache; `saved_ppm` normalizes by total
    * prompt characters (integer div, 0-guarded). */
  def prefixCacheReport(prompts: DataFrame, routeCol: String,
      textCol: String): DataFrame = {
    val agg = prompts.groupBy(col(routeCol))
      .agg(count(lit(1)).as("n_prompts"),
        sum(length(col(textCol))).cast("long").as("total_chars"),
        min(col(textCol)).as("__mn"), max(col(textCol)).as("__mx"))
    // sequence(1, 0) is DESCENDING in Spark — guard the empty-string case
    // explicitly instead of relying on an empty range
    val bound = least(length(col("__mn")), length(col("__mx")))
    val lcp = when(bound === 0, lit(0L)).otherwise(
      size(filter(sequence(lit(1), bound),
        i => col("__mn").substr(lit(1), i) === col("__mx").substr(lit(1), i)))
        .cast("long"))
    agg.withColumn("lcp_chars", lcp)
      .withColumn("saved_chars", (col("n_prompts") - 1L) * col("lcp_chars"))
      .withColumn("saved_ppm",
        when(col("total_chars") === 0L, lit(0L))
          .otherwise(expr("saved_chars * 1000000L div total_chars")))
      .select(col(routeCol), col("n_prompts"), col("total_chars"),
        col("lcp_chars"), col("saved_chars"), col("saved_ppm"))
  }

  /** Paged-KV block-reuse report — [[prefixCacheReport]] at BLOCK
    * granularity, the quantity a vLLM-style paged cache actually
    * manages: prompts split into fixed `blockChars` blocks, and a
    * block's cache key is the hash of the ENTIRE PREFIX through that
    * block (PagedAttention's block hash covers all preceding tokens, so
    * only identical prefixes share cache blocks). Per route: full blocks
    * generated, distinct block keys (= blocks the cache must hold),
    * `saved_blocks` a warm cache never recomputes, and the hit ratio.
    * Partial tail blocks are not cacheable and are excluded; routes
    * whose prompts are all shorter than one block report zeros.
    *
    * Scale shape: one explode to (route, block-key) — map-side — then a
    * keyed aggregate with a distinct count. The per-block prefix hash is
    * md5 over the prefix substring (O(len²/B) per prompt — fine for an
    * audit sweep); a production spelling chains a rolling hash
    * incrementally, same keys, same report. */
  def pagedBlockReuse(prompts: DataFrame, routeCol: String, textCol: String,
      blockChars: Int): DataFrame = {
    require(blockChars >= 1)
    val base = prompts.select(col(routeCol), col(textCol).as("__p"))
    val nblk = expr(s"CAST(length(__p) div $blockChars AS BIGINT)")
    val blocks = base
      .select(col(routeCol), col("__p"),
        explode(when(length(col("__p")) >= blockChars,
            sequence(lit(1L), nblk))
          .otherwise(array().cast("array<bigint>"))).as("__i"))
      .select(col(routeCol),
        md5(col("__p").substr(lit(1), (col("__i") * blockChars).cast("int")))
          .as("__key"))
    val agg = blocks.groupBy(col(routeCol))
      .agg(count(lit(1)).as("n_blocks"),
        countDistinct(col("__key")).as("n_distinct"))
    base.select(col(routeCol)).distinct()
      .join(agg, Seq(routeCol), "left")
      .select(col(routeCol),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
      .withColumn("saved_blocks", col("n_blocks") - col("n_distinct"))
      .withColumn("hit_ppm",
        when(col("n_blocks") === 0L, lit(0L))
          .otherwise(expr("saved_blocks * 1000000L div n_blocks")))
  }

  /** Speculative-decoding acceptance report — the capacity-planning table
    * behind draft-model serving (Leviathan et al. 2023): given a DRAFT
    * token stream and the TARGET model's stream for the same positions,
    * how many drafted tokens the target accepts per step. The standard
    * static-grid model: decoding proceeds in steps of `gamma` drafted
    * tokens; a step accepts the block's matching PREFIX and the target
    * then emits one token itself (the first rejected position's
    * correction, or a fresh token when the whole block matched) — so a
    * step produces `prefix + 1` tokens and
    * `speedup_ppm = produced · 1e6 div n_steps` is tokens-per-target-call
    * in ppm, the number that sizes a draft-serving fleet.
    *
    * Contract: the two arrays are position-aligned and equal-length
    * (callers produce them from the same prompt); a null element (ragged
    * input) counts as a mismatch rather than poisoning the row.
    *
    * Scale shape: one generate (posexplode of the zipped match vector —
    * map-side, no shuffle), one (id, block) hash aggregate, one per-id
    * aggregate. Nothing downstream exceeds the document count. */
  def speculativeAcceptance(seqs: DataFrame, idCol: String,
      draftCol: String, targetCol: String, gamma: Int): DataFrame = {
    require(gamma >= 1)
    val pos = seqs.select(col(idCol),
      posexplode(zip_with(col(draftCol), col(targetCol),
        (d, t) => coalesce(d === t, lit(false)))).as(Seq("__pos", "__m")))
    val blocks = pos
      .select(col(idCol), expr(s"__pos div $gamma").as("__blk"),
        expr(s"__pos % $gamma").as("__p"), col("__m"))
      .groupBy(col(idCol), col("__blk"))
      .agg(count(lit(1)).as("__bn"),
        sum(when(col("__m"), 1L).otherwise(0L)).as("__nm"),
        min(when(!col("__m"), col("__p"))).as("__miss"))
      .withColumn("__prefix", coalesce(col("__miss"), col("__bn")))
    blocks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_steps"), sum(col("__bn")).as("n_tokens"),
        sum(col("__nm")).as("n_match"), sum(col("__prefix")).as("accepted_tokens"))
      .withColumn("match_ppm", expr("n_match * 1000000L div n_tokens"))
      .withColumn("produced_tokens", col("accepted_tokens") + col("n_steps"))
      .withColumn("mean_accept_ppm",
        expr("accepted_tokens * 1000000L div n_steps"))
      .withColumn("speedup_ppm",
        expr("produced_tokens * 1000000L div n_steps"))
      .select(col(idCol), col("n_tokens"), col("n_match"), col("match_ppm"),
        col("n_steps"), col("accepted_tokens"), col("produced_tokens"),
        col("mean_accept_ppm"), col("speedup_ppm"))
  }
}

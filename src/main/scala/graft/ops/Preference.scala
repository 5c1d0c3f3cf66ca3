package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair construction — the data-prep step RLHF / DPO training
  * consumes: per prompt, rank the candidate responses by a scalar reward
  * and emit (chosen, rejected) pairs. The reference pipeline stops at
  * ranked Q&A candidates (REDDIT-Classement.py's score ordering); this is
  * the downstream artifact a preference-tuning run actually reads.
  *
  * Pairing rule: MIRRORED best-vs-worst — the r-th best candidate is
  * paired with the r-th worst (the standard construction from a ranked
  * list: it yields ⌊m/2⌋ disjoint pairs with the largest attainable
  * per-pair margins, instead of the O(m²) all-pairs blow-up). Pairs whose
  * reward margin falls below `minMargin` are dropped (a near-tie teaches
  * the preference model nothing), and at most `maxPairs` pairs emit per
  * prompt (the per-prompt cap every DPO recipe applies so prolific
  * prompts don't dominate the loss).
  *
  * Determinism: both rank orders carry total-order tiebreaks (reward,
  * then id — id DESCENDING on the worst-side rank so the mirror is a
  * bijection even under reward ties; tied pairs have margin 0 and are
  * dropped by `minMargin ≥ 1` anyway). Rewards are integer micro-units
  * throughout — no float comparisons anywhere.
  *
  * Scale shape: one shuffle keyed on the prompt for the two window
  * ranks, then a (prompt, r) equi-join of the capped best side (≤
  * `maxPairs` rows per prompt after the rank filter — the join's left
  * side is a vanishing fraction of the corpus) against the worst-side
  * rank. No self-cartesian, no driver state; AQE picks the join
  * strategy. At 100 TB the pair frame is bounded by
  * `maxPairs · n_prompts`, never by candidate count.
  */
object Preference {

  /** Emit preference pairs from per-candidate rewards.
    *
    * Input: one row per candidate with `groupCol` (the prompt key),
    * `idCol` (candidate id) and `scoreCol` (integer reward, micro-units).
    * Output: (`groupCol`, chosen_id, rejected_id, chosen_e6, rejected_e6,
    * margin_e6), one row per kept pair.
    */
  def pairsFromRanked(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, minMargin: Long, maxPairs: Int): DataFrame = {
    require(minMargin >= 1, "minMargin must be >= 1 (ties teach nothing)")
    require(maxPairs >= 1)
    val best = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val worst = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc, col(idCol).desc)
    val ranked = df.select(col(groupCol), col(idCol), col(scoreCol),
      row_number().over(best).cast("long").as("__rb"),
      row_number().over(worst).cast("long").as("__rw"))
    val chosen = ranked.filter(col("__rb") <= maxPairs)
      .select(col(groupCol), col("__rb").as("__r"),
        col(idCol).as("chosen_id"), col(scoreCol).as("chosen_e6"))
    val rejected = ranked
      .select(col(groupCol), col("__rw").as("__r"),
        col(idCol).as("rejected_id"), col(scoreCol).as("rejected_e6"))
    chosen.join(rejected, Seq(groupCol, "__r"))
      .withColumn("margin_e6", col("chosen_e6") - col("rejected_e6"))
      .filter(col("margin_e6") >= minMargin)
      .drop("__r")
  }

  /** Best-of-n rejection sampling (RFT / STaR data prep): per prompt,
    * keep the top `n` candidates by reward, subject to (a) an absolute
    * reward floor (`minScore` — below it a sample teaches nothing even
    * if it is the local best) and (b) near-identical responses collapsed
    * by a caller-supplied fingerprint column (the best-rewarded
    * representative of each fingerprint survives — rejection sampling
    * over an LLM's own outputs is rife with verbatim repeats, and
    * training on k copies of one answer is a silent upweight).
    *
    * Output: the survivors with their per-prompt `rank` (1 = best).
    * Determinism: both windows carry (score DESC, id ASC) total orders;
    * all comparisons are integer.
    *
    * Scale shape: two window ranks over the same (prompt-keyed) shuffle —
    * Catalyst collapses them into one exchange; the reward floor prunes
    * before either window. Output is bounded by `n · n_prompts`. */
  def bestOfN(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, fpCol: String, minScore: Long, n: Int): DataFrame = {
    require(n >= 1)
    val perFp = Window.partitionBy(col(groupCol), col(fpCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val best = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.filter(col(scoreCol) >= minScore)
      .withColumn("__rfp", row_number().over(perFp))
      .filter(col("__rfp") === 1)
      .withColumn("rank", row_number().over(best).cast("long"))
      .filter(col("rank") <= n)
      .drop("__rfp")
  }
}

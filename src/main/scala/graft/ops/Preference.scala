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

  /** Bradley-Terry strength estimation from pairwise outcomes — the
    * aggregation behind reward-model training data audits and
    * chatbot-arena-style leaderboards: given `matches(winnerCol,
    * loserCol)` (one row per decided comparison), estimate per-item
    * strengths via the classic MM fixed point (Zermelo 1929; Hunter
    * 2004):
    *
    *   s'_i = W_i / Σ_{j: n_ij > 0} n_ij / (s_i + s_j)
    *
    * spelled in exact BIGINT arithmetic: the inner terms are
    * `n_ij · 1e12 div (s_i + s_j)`, the update `W_i · 1e12 div denom`,
    * and each round renormalizes to mean 1e6 via
    * `s = u · 1e6 div (Σu div N)` — every step integer, so the
    * leaderboard hash-matches any engine. Items that never win converge
    * to 0 (the MM fixed point's behavior); a never-winner's u is 0, not
    * NULL, and items keep their previous score if their denominator
    * vanishes (isolated after zero-score neighbors — cannot happen on
    * connected comparison graphs).
    *
    * Scale shape: matches collapse ONCE to the undirected edge frame
    * (n_ij aggregated map-side); each round is two equi-joins of edges
    * against the ≤|items|-row score frame plus one keyed aggregation —
    * round cost scales with the EDGE count, not the raw match log, and
    * the frames stay artifact-sized (items × avg-degree). Rounds are
    * lazily checkpointed (the [[Bpe.learn]] discipline).
    *
    * BOUNDED-FRAME CONTRACT: the per-round renormalization runs a
    * `Window.partitionBy()` (whole-frame) sum/count over the SCORE frame
    * — deliberate: that frame is ≤|items| rows (models on a leaderboard,
    * arms in a comparison study — thousands, not corpus-scale), and one
    * task holding it is the point. Do NOT feed this operator an items
    * domain that scales with the corpus; for corpus-keyed global
    * normalization the two-phase [[Ids.globalRankCumsum]] is the
    * pattern. */
  def bradleyTerry(matches: DataFrame, winnerCol: String, loserCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1)
    val T = 1000000000000L // 1e12 — the fixed-point scale
    val dir = matches.select(col(winnerCol).as("i"), col(loserCol).as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("w"))
      .localCheckpoint(false)
    val edges = dir.select(col("i"), col("j"), col("w").as("n"))
      .unionByName(dir.select(col("j").as("i"), col("i").as("j"),
        col("w").as("n")))
      .groupBy(col("i"), col("j")).agg(sum(col("n")).as("n_ij"))
      .localCheckpoint(false)
    val wins = dir.groupBy(col("i")).agg(sum(col("w")).as("n_wins"))
    val items = edges.select(col("i").as("item")).distinct()
      .join(wins.withColumnRenamed("i", "item"), Seq("item"), "left")
      .withColumn("n_wins", coalesce(col("n_wins"), lit(0L)))
      .join(edges.groupBy(col("i").as("item"))
        .agg(sum(col("n_ij")).as("n_matches")), Seq("item"))
      .localCheckpoint(false)
    val g = Window.partitionBy()
    var s = items.withColumn("bt_ppm", lit(1000000L))
    for (_ <- 1 to rounds) {
      val si = s.select(col("item").as("i"), col("bt_ppm").as("__si"))
      val sj = s.select(col("item").as("j"), col("bt_ppm").as("__sj"))
      val den = edges.join(si, Seq("i")).join(sj, Seq("j"))
        .groupBy(col("i").as("item"))
        .agg(sum(expr(s"n_ij * ${T}L div (__si + __sj)")).as("__den"))
      s = s.join(den, Seq("item"), "left")
        .withColumn("__u",
          when(col("__den").isNull || col("__den") === 0L, col("bt_ppm"))
            .otherwise(expr(s"n_wins * ${T}L div __den")))
        .withColumn("__usum", sum(col("__u")).over(g))
        .withColumn("__ucnt", count(col("__u")).over(g))
        .withColumn("__norm", expr("__usum div __ucnt"))
        .withColumn("bt_ppm",
          when(col("__norm") === 0L, col("__u"))
            .otherwise(expr("__u * 1000000L div __norm")))
        .drop("__den", "__u", "__usum", "__ucnt", "__norm")
        .localCheckpoint(false)
    }
    s.select(col("item"), col("n_matches"), col("n_wins"), col("bt_ppm"))
  }

  /** Group-relative rank advantage — the GRPO-family normalization
    * (Shao et al. 2024): per prompt group, candidates rank by reward
    * (deterministic tie-break on the id) and the advantage is the
    * centered, scaled rank `adv_ppm = (n + 1 − 2·rank)·1e6 div (n − 1)` —
    * +1e6 for the group's best, −1e6 for its worst, exactly 0 mean when
    * ranks are distinct. Rank-based rather than (reward − mean)/std: no
    * variance, no sqrt, integer-exact in any engine, and robust to reward
    * scale — the practical reason rank advantages are used for
    * preference-data prep. Singleton groups carry no signal → 0.
    *
    * Scale shape: one per-group window over the candidate log (groups are
    * prompt-sized, tens of rows); nothing exceeds the candidate count. */
  def groupRankAdvantage(cand: DataFrame, groupCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, col(idCol).asc)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wg))
      .withColumn("adv_ppm",
        when(col("n") === 1L, lit(0L))
          .otherwise(expr("(n + 1L - 2L * rank) * 1000000L div (n - 1L)")))
      .select(col(groupCol), col(idCol), col(scoreCol), col("rank"),
        col("n"), col("adv_ppm"))
  }

  /** Position-bias audit over pairwise comparisons: per margin bucket
    * (|margin| div `bucketE6`), the share of matches the FIRST-SHOWN
    * side won. An unbiased judge reads 500000 ppm everywhere; position
    * bias shows as a positive offset that is LARGEST in the low-margin
    * buckets (close calls are where presentation order decides) — the
    * standard QA gate on human/LLM preference collection.
    *
    * `firstWinCol` is a boolean column: the caller knows which side was
    * shown first. Output: (margin_bucket, n, n_first_win, first_win_ppm,
    * bias_ppm). Scale shape: one map-combined aggregate over the match
    * log. */
  def positionBias(matches: DataFrame, firstWinCol: String,
      marginCol: String, bucketE6: Long): DataFrame = {
    require(bucketE6 >= 1)
    matches
      .groupBy(expr(s"abs($marginCol) div ${bucketE6}L").as("margin_bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(firstWinCol), 1L).otherwise(0L)).as("n_first_win"))
      .withColumn("first_win_ppm", expr("n_first_win * 1000000L div n"))
      .withColumn("bias_ppm", col("first_win_ppm") - lit(500000L))
  }
}

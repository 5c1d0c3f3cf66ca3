package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data MIXTURE construction — the step between a cleaned corpus
  * and a pretraining run: decide how many tokens of each stratum
  * (language, source, quality band) the final mix contains, and up/down
  * sample strata to hit target weights. The reference stops at a cleaned
  * merged table; these are the corpus-to-training-mix operators a 100 TB
  * pipeline needs next (they compose downstream of [[Dedup]]/[[Chunk]]).
  *
  * Everything is RNG-free: selection order and fractional draws come from
  * md5 of the id (the [[graft.Queries4.q56HashSample]] convention), so the
  * same rows are chosen on every engine, on every rerun, forever —
  * resumable at scale and hash-checkable against the DuckDB oracle.
  */
object Mixture {

  /** Deterministic hash order used for all sampling decisions. */
  private def hashOrder(idCol: String): Seq[Column] =
    Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc)

  /** Per-stratum token-budget sample: walk each stratum in md5-hash order
    * and keep rows while the running token total stays within `budget`
    * (inclusive; the first over-budget row and everything after it is
    * dropped). Emits `cum_tokens` so budget accounting is visible
    * downstream.
    *
    * Scale shape: the naive spelling funnels EVERY row of a stratum
    * through that stratum's single cumsum window task — at 100 TB with ~10
    * language strata, one task sorts a whole language to keep a budget's
    * worth. So the window here runs only on a BOUNDED slice, and the bound
    * is exact, not sampled: [[boundedSlice]] aggregates token totals per
    * (stratum, 16-bit md5-prefix bucket) — a map-side-combined shuffle of
    * at most |strata|·65536 rows — cumsums the per-BUCKET totals in hash
    * order (a window over ≤65536 rows per stratum), and keeps, per
    * stratum, only buckets up to the first whose running total STRICTLY
    * exceeds the budget. Every surviving row of the exact cumsum
    * necessarily lies in those buckets (the running total is monotone in
    * hash order and bucket order is a prefix of the row order), so the
    * final window sees ~budget + one bucket's worth of rows per stratum
    * instead of the whole stratum, and the results are identical by
    * construction. The prefilter is evaluated map-side directly over the
    * scan (a broadcast of one cutoff row per OVER-budget stratum — the
    * under-budget ones need no bound); the big side never shuffles before
    * being bounded.
    */
  def tokenBudgetSample(df: DataFrame, strataCol: String, idCol: String,
      tokenCount: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashOrder(idCol): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    boundedSlice(df, strataCol, idCol, tokenCount, budget)
      .withColumn("cum_tokens", sum(tokenCount).over(w).cast("long"))
      .filter(col("cum_tokens") <= budget)
  }

  /** The 16-bit md5-prefix bucket of the id — a PREFIX of [[hashOrder]]'s
    * sort key (md5 is fixed-length lowercase hex, so lexicographic order
    * of the full digest refines numeric order of its first 4 digits):
    * walking buckets ascending visits rows in the same order the cumsum
    * window does, coarsened to 65536 steps. */
  private def hashBucket(idCol: String): Column =
    conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10).cast("long")

  /** Exact superset of [[tokenBudgetSample]]'s survivors, bounded per
    * stratum (exposed for MixtureSpec's prune/superset assertions).
    *
    * Cutoff rule: a row is dropped iff its exact running total exceeds
    * `budget`; the running total through the END of bucket B is a lower
    * bound for every row in buckets > B, so once a bucket's cumulative
    * total strictly exceeds the budget, no later bucket can hold a
    * survivor. Strict (>) not (>=): a zero-token row whose running total
    * EQUALS the budget still survives the exact filter, and sits at
    * cum == budget, not beyond it. Strata whose grand total never exceeds
    * the budget produce no cutoff row → left join finds null → all rows
    * kept (nothing to prune). NULL strata never equi-join a cutoff and are
    * likewise kept unbounded — correct, merely unpruned. */
  private[graft] def boundedSlice(df: DataFrame, strataCol: String, idCol: String,
      tokenCount: Column, budget: Long): DataFrame = {
    val wb = Window.partitionBy(col(strataCol)).orderBy(col("__graft_bkt").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cutoffs = df.withColumn("__graft_bkt", hashBucket(idCol))
      .groupBy(col(strataCol), col("__graft_bkt"))
      .agg(sum(tokenCount).as("__graft_btok"))
      .withColumn("__graft_bcum", sum(col("__graft_btok")).over(wb))
      .filter(col("__graft_bcum") > budget)
      .groupBy(col(strataCol))
      .agg(min(col("__graft_bkt")).as("__graft_cut"))
    df.join(broadcast(cutoffs), Seq(strataCol), "left")
      .filter(col("__graft_cut").isNull || hashBucket(idCol) <= col("__graft_cut"))
      .drop("__graft_cut")
      // the using-column join hoists strataCol to the front; restore the
      // caller's column order so the bounded form is schema-identical
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Temperature-scaled stratum allocation — the mT5/XLM-R sampling rule
    * (Xue et al. 2021 §3.1; Conneau et al. 2020 §3): allocate a global
    * token budget across strata with mass ∝ n_s^alpha, so low-resource
    * strata are UP-sampled relative to their natural share (alpha < 1
    * flattens the distribution; alpha = 1 is proportional; alpha = 0
    * uniform). Output per stratum: `n_tokens` (natural size), `mass6`
    * (n^alpha in integer micro-units), `alloc_tokens` =
    * floor(budget · mass6 / Σ mass6), and `epochs_ppm` =
    * floor(alloc · 1e6 / n_tokens) — epochs > 1e6 ppm means the stratum
    * repeats (compose with [[repeatWeighted]] to realize the repetition).
    *
    * Determinism: at the default alpha = 0.5 the mass is
    * floor(sqrt(n)·1e6 + 0.5) — sqrt is IEEE-correctly-rounded in every
    * engine, and everything after is integer arithmetic (the budget·mass
    * product runs in decimal(38,0) so a 10^12-token budget times a 10^12
    * mass cannot overflow), so results hash-match the DuckDB oracle
    * bit-exactly. Other alphas go through libm `pow`, whose last-ulp
    * behavior is engine-specific — supported, spec-tested, but kept out
    * of the hash-checked oracle surface by design.
    *
    * Scale shape: one map-side-combined aggregation over the corpus (the
    * only full-data shuffle); everything after runs on |strata| rows with
    * the grand total joined as a 1-row broadcast. */
  def temperatureAlloc(df: DataFrame, strataCol: String, tokenCount: Column,
      budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget >= 0 && alpha >= 0.0)
    val nTok = col("n_tokens").cast("double")
    val mass =
      if (alpha == 0.5) floor(sqrt(nTok) * 1e6 + 0.5).cast("long")
      else floor(pow(nTok, lit(alpha)) * 1e6 + 0.5).cast("long")
    val massed = df.groupBy(col(strataCol))
      .agg(sum(tokenCount).cast("long").as("n_tokens"))
      .withColumn("mass6", mass)
    val total = massed.agg(sum(col("mass6")).as("__total_mass"))
    massed.crossJoin(broadcast(total))
      .withColumn("alloc_tokens",
        expr(s"CAST(CAST($budget AS DECIMAL(38,0)) * mass6 DIV __total_mass AS BIGINT)"))
      .withColumn("epochs_ppm",
        when(col("n_tokens") > 0, expr("alloc_tokens * 1000000 DIV n_tokens"))
          .otherwise(lit(0L)))
      .drop("__total_mass")
  }

  /** Deterministic weighted repetition (mixture epochs): every row of
    * stratum s appears `floor(w_s)` times, plus once more for the
    * `frac(w_s)` fraction of rows whose md5-derived uniform draw falls
    * below the fraction — so a 2.5-weighted stratum is seen 2.5 times per
    * epoch in expectation (exactly 2 or 3 per row, deterministically), and
    * a 0.25 weight DOWN-samples to a quarter. `copy` numbers the
    * repetitions (1-based); rows from weight-0 strata vanish.
    *
    * The fractional draw is the first 4 hex digits of md5 of the SALTED id
    * (`id || ":draw"`) scaled to [0,1) — coarse (2^16 buckets) but
    * engine-portable, and independent of [[tokenBudgetSample]]'s selection
    * order BY CONSTRUCTION: that order is ascending md5 of the unsalted
    * id, so drawing from the same digest would hand budget-sample
    * survivors systematically small draws and silently inflate fractional
    * weights when the two ops compose (a 1%-sampled stratum at w=1.5
    * would repeat ~100% of survivors instead of ~50%).
    *
    * Scale shape: pure map-side (project + explode), no shuffle; output
    * size is Σ w_s · |s|, which is the point.
    */
  def repeatWeighted(df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val draw =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":draw"))), 1, 4), 16, 10)
        .cast("long") / lit(65536.0)
    val copies = (floor(w).cast("long") +
      when(draw < w - floor(w), lit(1L)).otherwise(lit(0L))).as("__copies")
    df.withColumn("__copies", copies)
      .withColumn("copy",
        explode(when(col("__copies") >= 1,
          sequence(lit(1L), col("__copies")))
          .otherwise(array().cast("array<bigint>"))))
      .drop("__copies")
  }

  /** Deterministic epoch-shuffled data-loader order — the last mile
    * between a training mix and the trainer: every (epoch, example) gets a
    * dense global `position` in an order that is a PURE FUNCTION of
    * (epoch, id) — `md5(epoch || ':' || id)` — so every reshuffle is
    * different across epochs (the point of epoch shuffling), yet any
    * worker, on any rerun, on any partitioning, re-derives the identical
    * order (resumable mid-epoch from a position checkpoint; no RNG state
    * to persist, the Megatron-style shuffle-index file as a query).
    *
    * Scale shape: the E× epoch explode is map-side; the one shuffle is the
    * range-partitioned global sort any total order pays, and positions are
    * assigned by [[Ids.globalIndex]] (per-partition counts → broadcast
    * offsets → codegen'd projection), NOT a single-reducer
    * `row_number()`. At 100 TB one materializes a per-epoch manifest
    * lazily (filter `epoch = e` before the sort — the explode then costs
    * one epoch, and the key function is unchanged); the all-epochs
    * spelling here is the full manifest a small mix ships. */
  def epochOrder(df: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val e = df.withColumn("epoch",
      explode(sequence(lit(0), lit(epochs - 1))))
    val ord = md5(concat(col("epoch").cast("string"), lit(":"),
      col(idCol).cast("string")))
    Ids.globalIndex(e.withColumn("__ord", ord),
        Seq(col("epoch").asc, col("__ord").asc, col(idCol).asc), "position")
      .drop("__ord")
  }

  /** Per-group probabilistic cap — Common-Crawl-style domain thinning: every
    * row of a group with n ≤ `cap` members survives; a group with n > cap
    * keeps each row independently with probability cap/n, decided by a
    * deterministic hash draw (first 6 hex digits of md5(id), a uniform
    * integer in [0, 16^6)). Expected survivors per over-cap group ≈ cap.
    *
    * This is the thinning complement of [[tokenBudgetSample]]: no per-group
    * ORDER at all — where the budget sample walks each stratum in hash
    * order (a sort), the cap is a stateless per-row predicate, so giant
    * groups cost exactly one aggregate + one broadcast join, never a sort
    * or window. That is the right shape when groups can be billions of rows.
    *
    * Output: input columns + `grp_n` (group size) + `keep`.
    *
    * A NULL group key is a group like any other (rows with no domain are a
    * real stratum in scraped corpora): the join back to the per-group
    * counts is NULL-SAFE equality, so NULL-group rows get their own count
    * and draw instead of silently vanishing through an equi-join.
    */
  def groupCap(df: DataFrame, groupCol: String, idCol: String,
      cap: Long): DataFrame = {
    require(cap >= 0, s"cap must be >= 0, got $cap")
    val Hex6 = 16777216L // 16^6 draws: md5's first 6 hex digits
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("grp_n"))
      // threshold in draw space; over-cap groups keep draws < cap*16^6/n
      .withColumn("__thr",
        when(col("grp_n") <= cap, lit(Hex6))
          .otherwise(expr(s"CAST($cap AS BIGINT) * $Hex6 DIV grp_n")))
      .withColumn("__thr_hex", lpad(lower(hex(col("__thr"))), 7, "0"))
      .withColumnRenamed(groupCol, "__grp")
    val draw = lpad(substring(md5(col(idCol).cast("string")), 1, 6), 7, "0")
    df.join(broadcast(counts), col(groupCol) <=> col("__grp"))
      .drop("__grp")
      .withColumn("keep", draw < col("__thr_hex"))
      .drop("__thr", "__thr_hex")
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023), the deterministic
    * integer-arithmetic core: domains whose average loss exceeds the
    * corpus average get multiplicatively upweighted, `rounds` times, with
    * renormalization to ppm after every round.
    *
    *   excess_e6 = max(0, domain_avg_loss − corpus_avg_loss)      (once)
    *   u_r       = w_r · (1e6 + η_ppm · excess_e6 div 1e6) div 1e6
    *   w_{r+1}   = u_r · 1e6 div Σ u_r                            (ppm)
    *
    * The real DoReMi recomputes excess loss per round under a reference
    * model; here the loss column is a fixed per-row proxy (the caller
    * binds perplexity, quality deficit, …), so the fixed-point shows the
    * reweighting machinery while staying engine-exact: every step is
    * BIGINT (no exp/log — the multiplicative-weights factor is the
    * first-order expansion, which is what makes an exact oracle possible).
    *
    * Scale shape: ONE aggregation over the corpus (map-side combined sums
    * keyed by domain), then `rounds` rounds of scalar arithmetic on the
    * ≤|domains|-row frame — loop cost is independent of corpus size. The
    * global sums ride a single-partition window over that bounded frame,
    * never over data. Magnitudes: w ≤ 1e6, factor ≤ 1e6 + η_ppm, so
    * u ≤ 1e6·(1e6+η) div 1e6 ≈ 2.1e6 and u·1e6 ≤ 2.1e12 — far under 2^63.
    */
  def doremiWeights(df: DataFrame, domainCol: String, lossE6: Column,
      rounds: Int, etaPpm: Long): DataFrame = {
    require(rounds >= 1 && etaPpm >= 0 && etaPpm <= 1000000L,
      "rounds >= 1 and 0 <= etaPpm <= 1e6")
    val g = Window.partitionBy() // ≤|domains| rows — single partition is the point
    val dom = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(lossE6).as("__sum"))
      .withColumn("loss_avg_e6", expr("__sum div n_docs"))
      .withColumn("__gsum", sum(col("__sum")).over(g))
      .withColumn("__gn", sum(col("n_docs")).over(g))
      .withColumn("excess_e6",
        greatest(lit(0L), col("loss_avg_e6") - expr("__gsum div __gn")))
      .drop("__sum", "__gsum", "__gn")
    val fin = (1 to rounds).foldLeft(dom.withColumn("weight_ppm", lit(1000000L))) {
      (d, _) =>
        d.withColumn("__u",
            expr(s"weight_ppm * (1000000L + $etaPpm * excess_e6 div 1000000L) div 1000000L"))
          .withColumn("__usum", sum(col("__u")).over(g))
          .withColumn("weight_ppm", expr("__u * 1000000L div __usum"))
          .drop("__u", "__usum")
    }
    fin.select(col(domainCol), col("n_docs"), col("loss_avg_e6"),
      col("excess_e6"), col("weight_ppm"))
  }

  /** Priority sampling (Duffield, Lund & Thorup 2007): a weight-aware
    * fixed-size sample per stratum with unbiased subset-sum estimates —
    * the principled way to keep k documents per language while still
    * estimating any weighted total from the sample alone. Per item,
    * priority `q = w·2^32 div (h+1)` with h the md5-bridge 32-bit hash of
    * the id (h+1 plays u ∈ (0,1] scaled by 2^32, so q ≥ w always); keep
    * the k highest-priority items per stratum; the (k+1)-th priority is
    * the threshold τ, and each kept item's Horvitz–Thompson weight is
    * `max(w, τ)` — Σ over the sample unbiasedly estimates Σw over the
    * stratum. Strata with ≤ k items keep everything exactly (τ = 0,
    * ht = w).
    *
    * Output: one row per SAMPLED item (strataCol, id, w, priority, tau,
    * ht_w). Deterministic: md5 ordering, id tiebreak. Scale shape: one
    * md5 projection, one per-stratum top-(k+1) window (WindowGroupLimit
    * pushes the heap map-side — the q177 bottom-k shape), one |strata|-row
    * tau aggregate joined back by equi-key. */
  def prioritySample(df: DataFrame, strataCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val h = conv(substring(md5(concat(lit("ps:"), col(idCol).cast("string"))),
      1, 8), 16, 10).cast("long")
    val withH = df.select(col(strataCol), col(idCol),
        greatest(col(weightCol).cast("long"), lit(1L)).as("w"),
        h.as("__h"))
      .withColumn("priority", expr(s"w * ${1L << 32}L div (__h + 1L)"))
    val wnd = Window.partitionBy(col(strataCol))
      .orderBy(col("priority").desc, col(idCol).asc)
    val top = withH.withColumn("__rn", row_number().over(wnd))
      .filter(col("__rn") <= k + 1)
    val tau = top.groupBy(col(strataCol))
      .agg(max(when(col("__rn") === k + 1, col("priority"))).as("tau"))
      .withColumn("tau", coalesce(col("tau"), lit(0L)))
    top.filter(col("__rn") <= k)
      .join(tau, Seq(strataCol))
      .select(col(strataCol), col(idCol), col("w"), col("priority"),
        col("tau"), greatest(col("w"), col("tau")).as("ht_w"))
  }

  /** Variance-weighted QC-sample allocation: split an inspection budget
    * across strata proportionally to n_h·var_h — high-variance strata
    * get more eyeballs (Neyman allocation with σ² in place of σ: true
    * Neyman needs a sqrt whose last-ulp both engines can disagree on;
    * the σ² variant stays integer-exact and preserves the ordering
    * rationale). The spread statistic is Σ(v − m)² with m the FLOORED
    * stratum mean — the expansion Σv² − 2mΣv + n·m² keeps every
    * intermediate ≤ n·max(v)², far from int64 overflow where n·Σv²
    * alone would pass 2^63 (the q216 lesson).
    *
    * Output: (strataCol, n, var_weight, alloc) — floor allocation
    * capped at the stratum size (Σ alloc ≤ budget by flooring); when
    * every stratum is constant (Σ weights = 0) the budget falls back to
    * n-proportional. Scale shape: one stratum aggregate + a 1-row
    * total cross join. */
  def varianceAllocation(df: DataFrame, strataCol: String,
      valueCol: String, budget: Long): DataFrame = {
    require(budget >= 1)
    val per = df
      .select(col(strataCol), col(valueCol).cast("long").as("__v"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__sv"),
        sum(col("__v") * col("__v")).as("__sv2"))
      .withColumn("__m", expr("__sv div n"))
      .withColumn("var_weight",
        expr("__sv2 - 2L * __m * __sv + n * __m * __m"))
    per
      .crossJoin(per.agg(sum(col("var_weight")).as("__tw"),
        sum(col("n")).as("__tn")))
      .withColumn("alloc", least(col("n"),
        expr(s"CASE WHEN __tw = 0 THEN ${budget}L * n div __tn" +
          s" ELSE ${budget}L * var_weight div __tw END")))
      .select(col(strataCol), col("n"), col("var_weight"), col("alloc"))
  }

  /** GLOBAL best-first selection under a corpus token budget — the
    * data-selection step itself: rank every document by quality score
    * (ties to the id) across the WHOLE corpus and keep documents from the
    * top until the next one would push the running token total past
    * `budget`. The complement of [[tokenBudgetSample]]: that op fills a
    * budget per stratum in unbiased hash order; this one spends one
    * global budget on the best-scoring documents wherever they live —
    * the DSIR/quality-classifier selection pattern (q113 selects a fixed
    * top-k; a pretraining run is budgeted in TOKENS, not documents).
    *
    * Scale shape: one keyed projection, then [[Ids.globalRankCumsum]] —
    * range-partitioned two-phase rank + running token sum, NO
    * single-partition window (the q216 lesson; a global `ntile`/
    * `row_number` spelling would sort the corpus on one task). The budget
    * test is then a map-side filter on the cum column.
    *
    * Output: (rank, idCol, scoreCol, tokenCol, cum_tokens), rank dense
    * ascending from 1, cum_tokens ≤ budget (inclusive; the first
    * over-budget document and everything below it is dropped). */
  def budgetSelection(df: DataFrame, idCol: String, scoreCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    require(budget >= 0)
    val base = df.select(col(idCol), col(scoreCol),
      col(tokenCol).cast("long").as(tokenCol))
    val (ranked, _, _) = Ids.globalRankCumsum(base,
      Seq(col(scoreCol).desc, col(idCol).asc), tokenCol,
      "rank", "cum_tokens")
    ranked.filter(col("cum_tokens") <= budget)
      .select(col("rank"), col(idCol), col(scoreCol), col(tokenCol),
        col("cum_tokens"))
  }

  /** A phase of an annealing data schedule: admit only documents whose
    * quality score (ppm) clears `floorPpm`, and spend `budgetTokens` on
    * the survivors under the α=0.5 temperature rule. */
  final case class AnnealPhase(name: String, floorPpm: Long, budgetTokens: Long) {
    require(budgetTokens >= 0, s"phase $name: budget must be >= 0")
  }

  /** Multi-phase ANNEALING schedule — the mid-training recipe every
    * recent pretraining report describes (raise the quality floor and
    * re-weight domains for the final fraction of the token budget): for
    * each phase, documents at or above that phase's quality floor form
    * the eligible pool, and the phase's token budget is allocated across
    * strata by the α=0.5 temperature rule ([[temperatureAlloc]]'s
    * integer-exact mass = floor(√n_tokens·1e6 + 0.5)). Later phases with
    * higher floors naturally concentrate the budget on high-quality
    * strata — and `epochs_ppm > 1e6` tells the caller exactly which
    * (phase, stratum) cells must repeat data to meet their allocation
    * (compose with [[repeatWeighted]] to realize it).
    *
    * Output: one row per (phase, stratum) with an eligible document —
    * (phase, stratum, n_docs, n_tokens, mass6, alloc_tokens, epochs_ppm),
    * integer-exact end to end (the budget·mass product runs in
    * decimal(38,0), the same rule as [[temperatureAlloc]]).
    *
    * Scale shape: ONE corpus scan for the whole schedule — the phase
    * dimension is a map-side `explode` over the (bounded, driver-literal)
    * phase list, the per-(phase, stratum) rollup is one map-side-combined
    * aggregation, and everything after (mass, per-phase total, allocation)
    * runs on |phases|·|strata| rows with the phase totals as a window
    * partitioned by phase over that bounded frame. No per-phase re-scan,
    * no collect, no single-partition exchange. */
  def annealSchedule(df: DataFrame, strataCol: String, tokenCount: Column,
      scorePpm: Column, phases: Seq[AnnealPhase]): DataFrame = {
    require(phases.nonEmpty, "annealSchedule needs at least one phase")
    require(phases.map(_.name).distinct.size == phases.size,
      "phase names must be unique")
    val floorMap = map(phases.flatMap(p => Seq(lit(p.name), lit(p.floorPpm))): _*)
    val budgetMap = map(phases.flatMap(p => Seq(lit(p.name), lit(p.budgetTokens))): _*)
    val eligible = df
      .select(col(strataCol), tokenCount.cast("long").as("__tok"),
        scorePpm.cast("long").as("__score"))
      .withColumn("phase", explode(typedLit(phases.map(_.name))))
      .filter(col("__score") >= element_at(floorMap, col("phase")))
    val perCell = eligible
      .groupBy(col("phase"), col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
      .withColumn("mass6",
        floor(sqrt(col("n_tokens").cast("double")) * 1e6 + 0.5).cast("long"))
    // bounded frame: |phases| x |strata| rows; the window hashes on phase
    val wp = Window.partitionBy(col("phase"))
    perCell
      .withColumn("__total_mass", sum(col("mass6")).over(wp))
      .withColumn("__budget", element_at(budgetMap, col("phase")))
      // a phase whose eligible docs are all zero-length has cells but no
      // mass — nothing to allocate to, 0 by convention (PropertySpec
      // feeds it), not an ANSI division error
      .withColumn("alloc_tokens",
        when(col("__total_mass") <= 0L, lit(0L)).otherwise(
          expr("CAST(CAST(__budget AS DECIMAL(38,0)) * mass6 DIV __total_mass" +
            " AS BIGINT)")))
      // the ·1e6 upscale rides decimal(38,0) like the allocation itself
      // (ADVICE r14): a phase budget past ~9.2e12 tokens — plausible at
      // the 100 TB scale — would overflow the plain-int64 product, and
      // unlike paddingWaste's ratio this one can exceed 1e6 (epochs > 1),
      // so the numerator-downscale branch has no safe denominator; the
      // decimal route is exact at any realizable budget
      .withColumn("epochs_ppm",
        when(col("n_tokens") > 0, expr(
          "CAST(CAST(alloc_tokens AS DECIMAL(38,0)) * 1000000 DIV n_tokens" +
            " AS BIGINT)"))
          .otherwise(lit(0L)))
      .drop("__total_mass", "__budget")
  }

  /** Length-band reweighting — the LONG-CONTEXT mix planner: bucket
    * documents by power-of-two token-length bands (band = ⌊log₂ len⌋,
    * spelled as the BINARY-DIGIT COUNT minus one so both engines compute
    * it in integer arithmetic — `log(8)/log(2)` is 2.9999… in IEEE and
    * floors wrong), compare each band's natural token share against a
    * caller-given target distribution, and emit the repeat weight that
    * realizes the target. Long-context training needs this because
    * natural corpora are short-heavy: hitting "10% of tokens from 8k+
    * documents" means repeating the long tail, and `weight_ppm` is
    * exactly the factor [[repeatWeighted]] then applies per band.
    *
    * Output per OBSERVED band (a target on a band with no documents is
    * unrealizable by reweighting — it stays absent, and the caller's
    * targets-sum check catches the gap): (band, n_docs, n_tokens,
    * natural_ppm, target_ppm, weight_ppm) where
    * natural_ppm = band tokens ·1e6 div total (branched on the
    * 9 223 372 036 854 bound), target_ppm is looked up from the literal
    * map (0 if absent), and weight_ppm = target_ppm·1e6 div natural_ppm.
    *
    * Scale shape: one map-side band projection + one map-combined
    * aggregation to |bands| rows; the grand total is a 1-row broadcast
    * into that bounded frame. Zero-length docs land in band 0 alongside
    * one-token docs (both render one binary digit) — filter upstream if
    * they shouldn't count. */
  def lengthBandReweight(df: DataFrame, tokenCount: Column,
      targetPpm: Map[Long, Long]): DataFrame = {
    require(targetPpm.values.forall(_ >= 0), "target ppm must be >= 0")
    val tmap = map(targetPpm.toSeq.sortBy(_._1)
      .flatMap(p => Seq(lit(p._1), lit(p._2))): _*)
    val banded = df
      .select(tokenCount.cast("long").as("__tok"))
      .withColumn("band",
        (length(conv(col("__tok"), 10, 2)) - 1L).cast("long"))
    // ≤64-row band frame, lazily checkpointed: it feeds both the report
    // and the 1-row grand total, and without the pin the scalar cross
    // join's second branch would re-scan the corpus (the decayScore rule)
    val perBand = banded.groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
      .localCheckpoint(false)
    // grand total as a 1-row broadcast into the band frame — the
    // temperatureAlloc scalar pattern (no unpartitioned window)
    val total = perBand.agg(sum(col("n_tokens")).as("__total"))
    perBand.crossJoin(broadcast(total))
      .withColumn("natural_ppm",
        expr("""CASE WHEN __total <= 0L THEN 0L
               |     WHEN __total <= 9223372036854L
               |       THEN n_tokens * 1000000L div __total
               |     ELSE n_tokens div (__total div 1000000L)
               |END""".stripMargin).cast("long"))
      .withColumn("target_ppm",
        coalesce(element_at(tmap, col("band")), lit(0L)))
      .withColumn("weight_ppm",
        when(col("natural_ppm") > 0L,
          expr("target_ppm * 1000000L div natural_ppm")).otherwise(lit(0L)))
      .drop("__total")
  }
}

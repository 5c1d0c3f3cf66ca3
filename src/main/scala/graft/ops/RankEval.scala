package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation — the governance table a retrieval stack
  * ships with its index: given a per-query ranking and a relevance set,
  * score recall@k, MRR and nDCG@k. In a 100 TB pipeline the relevance
  * pairs come from weak supervision (the q135 binding uses cluster-label
  * agreement; click logs or editorial judgments slot in identically), so
  * retrieval quality is auditable continuously, without human labels.
  *
  * Determinism: the per-rank DCG gain `floor(1e6 / log2(rank+1) + 0.5)`
  * and its cumulative ideal prefix are computed ONCE, driver-side, and
  * enter both the Spark plan and the generated oracle SQL as integer
  * LITERALS ([[dcgGainsE6]] / [[idealCumE6]]) — zero libm calls at run
  * time, so the audit is bitwise engine-exact (the q124SqlWith
  * shared-generator precedent).
  */
object RankEval {

  /** DCG gain per rank position in micro-units: g(r) = floor(1e6 /
    * log2(r+1) + 0.5), r = 1..k. */
  def dcgGainsE6(k: Int): Array[Long] =
    (1 to k).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong).toArray

  /** Ideal cumulative DCG prefix: idcg(m) = Σ_{r=1..m} g(r), m = 1..k
    * (the ideal ranking puts a relevant document at every position). */
  def idealCumE6(k: Int): Array[Long] = dcgGainsE6(k).scanLeft(0L)(_ + _).tail

  /** Score `ranked(queryIdCol, docIdCol, rankCol)` (any per-query ranking,
    * rank 1-based) against `rels(queryIdCol, docIdCol)` relevance pairs.
    * Per query: hits in the top-k, the total relevant count, MRR
    * (`1e6 div first-relevant-rank`, 0 when none), DCG@k, the ideal
    * DCG for `least(n_rel_total, k)` relevant documents, and
    * `ndcg_ppm = dcg·1e6 div idcg` (0 for queries with no relevant
    * documents at all — vacuous by convention).
    *
    * Scale shape: one equi-join of the (|queries|·k)-row shortlist onto
    * the relevance pairs, one per-query aggregation each side — the
    * corpus never enters; `rels` need only cover the audited queries.
    * Output: (queryIdCol, n_rel_at_k, n_rel_total, mrr_ppm, dcg_e6,
    * idcg_e6, ndcg_ppm). */
  def ndcgAudit(ranked: DataFrame, queryIdCol: String, docIdCol: String,
      rankCol: String, rels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val gains = dcgGainsE6(k)
    val cum = idealCumE6(k)
    val marked = ranked.filter(col(rankCol) <= k)
      .join(rels.select(col(queryIdCol), col(docIdCol), lit(1).as("__rel")),
        Seq(queryIdCol, docIdCol), "left")
    val g = element_at(lit(gains), col(rankCol).cast("int"))
    val perQ = marked.groupBy(col(queryIdCol)).agg(
      count(col("__rel")).as("n_rel_at_k"),
      coalesce(sum(when(col("__rel").isNotNull, g)), lit(0L)).as("dcg_e6"),
      min(when(col("__rel").isNotNull, col(rankCol).cast("long"))).as("__first"))
    val totals = rels.groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("n_rel_total"))
    perQ
      .join(totals, Seq(queryIdCol), "left")
      .withColumn("n_rel_total", coalesce(col("n_rel_total"), lit(0L)))
      .withColumn("mrr_ppm",
        coalesce(expr("1000000L div __first"), lit(0L)))
      .withColumn("idcg_e6",
        when(col("n_rel_total") === 0L, lit(0L))
          .otherwise(element_at(lit(cum),
            least(col("n_rel_total"), lit(k.toLong)).cast("int"))))
      .withColumn("ndcg_ppm",
        when(col("idcg_e6") === 0L, lit(0L))
          .otherwise(expr("dcg_e6 * 1000000L div idcg_e6")))
      .select(col(queryIdCol), col("n_rel_at_k"), col("n_rel_total"),
        col("mrr_ppm"), col("dcg_e6"), col("idcg_e6"), col("ndcg_ppm"))
  }

  /** Unbiased pass@k estimator (the HumanEval/codegen eval statistic:
    * Chen et al. 2021, §2.1): per task with `n` samples of which `c` are
    * correct, `pass@k = 1 − C(n−c, k)/C(n, k)` — the probability that at
    * least one of k drawn samples is correct, estimated without the
    * naive-resampling bias.
    *
    * Integer-exact spelling: the binomial ratio telescopes to a falling-
    * factorial quotient `Π_{i<k}(n−c−i) / Π_{i<k}(n−i)`, expanded here as
    * literal products (k is a compile-time constant per output column), so
    * `pass_k_ppm = 1e6 − (num · 1e6 div den)` uses only BIGINT arithmetic
    * and hashes identically in any engine. Callers keep `n` small (samples
    * per task — tens, not thousands); the products stay far below 2^63 for
    * the k ≤ 10, n ≤ 100 regime this models.
    *
    * Tasks with fewer than `max(ks)` samples are dropped — the estimator
    * is undefined for k > n, and a partially-defined row would force
    * nullable columns into the eval artifact.
    *
    * Scale shape: one hash aggregate over the sample log keyed by the
    * task (map-side combined counts), then per-task scalar arithmetic.
    * Nothing downstream is larger than the task list. */
  def passAtK(samples: DataFrame, taskCol: String, correct: Column,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be positive")
    val agg = samples.groupBy(col(taskCol))
      .agg(count(lit(1)).as("n_samples"),
        sum(when(correct, 1L).otherwise(0L)).as("n_correct"))
      .filter(col("n_samples") >= ks.max.toLong)
    ks.distinct.sorted.foldLeft(agg) { (d, k) =>
      val num = (0 until k).map(i => s"(n_samples - n_correct - $i)").mkString(" * ")
      val den = (0 until k).map(i => s"(n_samples - $i)").mkString(" * ")
      d.withColumn(s"pass_${k}_ppm",
        expr(s"CASE WHEN n_samples - n_correct >= $k " +
          s"THEN 1000000L - (($num) * 1000000L div ($den)) " +
          "ELSE 1000000L END").cast("long"))
    }
  }

  /** Self-consistency majority vote (Wang et al. 2022's decoding-time
    * ensemble): per task, the modal extracted answer across samples, with
    * a DETERMINISTIC tie-break (largest vote count, then smallest answer
    * value) so the artifact hashes identically in any engine. `goldCol`
    * must be constant within a task (the reference answer); the report
    * compares majority-vote correctness against the per-sample agreement
    * rate, the quantity that tells you whether voting buys accuracy.
    *
    * Scale shape: one hash aggregate to (task, answer) vote counts —
    * map-side combined, so the sample log collapses before any shuffle —
    * then per-task windows over the (tasks × distinct-answers) frame,
    * which is bounded by the answer-space size, not the sample count.
    *
    * Output per task: (taskCol, n_samples, n_distinct_answers,
    * majority_answer, majority_n, majority_share_ppm, sample_correct_ppm,
    * gold, majority_correct). */
  def selfConsistency(samples: DataFrame, taskCol: String,
      answerCol: String, goldCol: String): DataFrame = {
    val votes = samples.groupBy(col(taskCol), col(answerCol))
      .agg(count(lit(1)).as("__nv"), min(col(goldCol)).as("__gold"))
    val wTask = Window.partitionBy(col(taskCol))
    val wRank = wTask.orderBy(col("__nv").desc, col(answerCol).asc)
    votes
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("n_samples", sum(col("__nv")).over(wTask))
      .withColumn("n_distinct_answers", count(lit(1)).over(wTask))
      .withColumn("__ncorr",
        sum(when(col(answerCol) === col("__gold"), col("__nv"))
          .otherwise(lit(0L))).over(wTask))
      .filter(col("__rn") === 1)
      .select(col(taskCol), col("n_samples"), col("n_distinct_answers"),
        col(answerCol).as("majority_answer"),
        col("__nv").as("majority_n"),
        expr("__nv * 1000000L div n_samples").as("majority_share_ppm"),
        expr("__ncorr * 1000000L div n_samples").as("sample_correct_ppm"),
        col("__gold").as("gold"),
        (col(answerCol) === col("__gold")).as("majority_correct"))
  }

  /** Expected-calibration-error bins — the governance table a quality /
    * reward / routing classifier ships with: bucket predictions by stated
    * confidence (`confPpmCol` in [0, 1e6]), and per bin compare the mean
    * stated confidence against the realized accuracy of `correct`. The
    * global `ece_ppm = Σ_b n_b·|acc_b − conf_b| div N` rides on every row
    * so the artifact is self-contained. `1e6` must divide evenly into
    * `nBins`; confidence exactly 1e6 folds into the top bin.
    *
    * Scale shape: one map-combined hash aggregate from the prediction log
    * to ≤ nBins rows; the window that totals ECE runs on that literal-
    * sized frame. All arithmetic BIGINT (integer div, 0-guarded). */
  def calibrationBins(preds: DataFrame, confPpmCol: String,
      correct: Column, nBins: Int): DataFrame = {
    require(nBins >= 1 && 1000000 % nBins == 0,
      "nBins must divide 1e6 evenly")
    val width = 1000000L / nBins
    val agg = preds
      .select(least(expr(s"$confPpmCol div ${width}L"), lit(nBins - 1L))
          .cast("long").as("bin"),
        col(confPpmCol).cast("long").as("__c"),
        when(correct, 1L).otherwise(0L).as("__ok"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_preds"), sum(col("__c")).as("__sc"),
        sum(col("__ok")).as("__nc"))
      .withColumn("avg_conf_ppm", expr("__sc div n_preds"))
      .withColumn("acc_ppm", expr("__nc * 1000000L div n_preds"))
      .withColumn("gap_ppm", abs(col("acc_ppm") - col("avg_conf_ppm")))
    agg
      .withColumn("ece_ppm",
        expr("sum(n_preds * gap_ppm) over () div sum(n_preds) over ()"))
      .select(col("bin"), col("n_preds"), col("avg_conf_ppm"),
        col("acc_ppm"), col("gap_ppm"), col("ece_ppm"))
  }

  /** Fleiss' kappa per annotation batch — the inter-annotator agreement
    * gate an RLHF labeling pipeline applies before trusting a batch of
    * preference / safety labels. Contract: every item in a group carries
    * ≥ 2 ratings (items with fewer are dropped — agreement is undefined
    * for a single rating); the classic statistic additionally assumes a
    * CONSTANT rater count per item, which callers guarantee by design.
    *
    * Integer-exact spelling: per-item observed agreement
    * `P_o(i) = Σ_j n_ij(n_ij−1) · 1e6 div (n_i(n_i−1))`, batch P_o is the
    * integer mean over items; chance agreement `P_e = Σ_j p_j²` with
    * `p_j = n_j·1e6 div n_ratings` (each squared term divided back by
    * 1e6); `kappa_ppm = (P_o − P_e)·1e6 div (1e6 − P_e)` — negative
    * kappas use the same truncate-toward-zero `div` both engines share.
    * Degenerate `P_e = 1e6` (every rating one category) reports 1e6.
    *
    * Scale shape: one hash aggregate to (group, item, label) counts —
    * the rating log collapses map-side — then two small re-aggregations
    * (per item, per label) of that counts frame and a join on the
    * ≤ |groups|-row results. */
  def fleissKappa(ratings: DataFrame, groupCol: String, itemCol: String,
      labelCol: String): DataFrame = {
    val c = ratings.groupBy(col(groupCol), col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("__nij"))
    val items = c.groupBy(col(groupCol), col(itemCol))
      .agg(sum(expr("__nij * (__nij - 1L)")).as("__pairs"),
        sum(col("__nij")).as("__ni"))
      .filter(col("__ni") >= 2L)
      .withColumn("__po_i", expr("__pairs * 1000000L div (__ni * (__ni - 1L))"))
    val po = items.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"), sum(col("__ni")).as("n_ratings"),
        sum(col("__po_i")).as("__sp"))
      .withColumn("po_ppm", expr("__sp div n_items"))
    val wg = Window.partitionBy(col(groupCol))
    val pe = c.groupBy(col(groupCol), col(labelCol))
      .agg(sum(col("__nij")).as("__nj"))
      .withColumn("__tot", sum(col("__nj")).over(wg))
      .withColumn("__pj", expr("__nj * 1000000L div __tot"))
      .groupBy(col(groupCol))
      .agg(sum(expr("__pj * __pj div 1000000L")).as("pe_ppm"))
    po.join(pe, Seq(groupCol))
      .withColumn("kappa_ppm",
        when(col("pe_ppm") === 1000000L, lit(1000000L))
          .otherwise(expr(
            "(po_ppm - pe_ppm) * 1000000L div (1000000L - pe_ppm)")))
      .select(col(groupCol), col("n_items"), col("n_ratings"),
        col("po_ppm"), col("pe_ppm"), col("kappa_ppm"))
  }

  /** Trimmed-mean robust scoring — the outlier guard an eval leaderboard
    * applies before comparing noisy per-sample scores: per task, drop the
    * `trim` lowest and `trim` highest scores (ties broken on the id, so
    * the drop set is deterministic) and average the rest. Tasks with
    * ≤ 2·trim samples keep the plain mean (nothing sensible to trim) and
    * report `trimmed = false`. Scores are integer micro-units in, means
    * are integer-divided out.
    *
    * Scale shape: two per-task rank windows + one aggregate over the
    * sample log; group sizes are samples-per-task (tens). Output:
    * (taskCol, n_samples, mean_ppm, trimmed_mean_ppm, trimmed,
    * delta_ppm). */
  def trimmedMean(samples: DataFrame, taskCol: String, idCol: String,
      scorePpmCol: String, trim: Int): DataFrame = {
    require(trim >= 1)
    val asc = Window.partitionBy(col(taskCol))
      .orderBy(col(scorePpmCol).asc, col(idCol).asc)
    val desc = Window.partitionBy(col(taskCol))
      .orderBy(col(scorePpmCol).desc, col(idCol).desc)
    samples
      .withColumn("__ra", row_number().over(asc))
      .withColumn("__rd", row_number().over(desc))
      .groupBy(col(taskCol))
      .agg(count(lit(1)).as("n_samples"),
        sum(col(scorePpmCol)).as("__s"),
        sum(when(col("__ra") > trim && col("__rd") > trim,
          col(scorePpmCol))).as("__ts"),
        count(when(col("__ra") > trim && col("__rd") > trim, 1)).as("__tn"))
      .withColumn("mean_ppm", expr("__s div n_samples"))
      .withColumn("trimmed", col("__tn") > 0L)
      .withColumn("trimmed_mean_ppm",
        when(col("trimmed"), expr("__ts div __tn")).otherwise(col("mean_ppm")))
      .withColumn("delta_ppm", col("trimmed_mean_ppm") - col("mean_ppm"))
      .select(col(taskCol), col("n_samples"), col("mean_ppm"),
        col("trimmed_mean_ppm"), col("trimmed"), col("delta_ppm"))
  }

  /** Exact two-sided sign-test p-values in ppm for every (n, wins) with
    * n ≤ `maxN`: `p = min(1, 2 · P(X ≤ min(w, n−w)))`, X ~ Binomial(n,
    * ½) — computed driver-side in exact BigInt arithmetic and emitted as
    * literals (the [[dcgGainsE6]] discipline: zero libm at run time, so
    * the gate is bitwise engine-exact). */
  def signTestTable(maxN: Int): Seq[(Long, Long, Long)] = {
    require(maxN >= 1 && maxN <= 62, "2^n must fit a Long")
    for {
      n <- 1 to maxN
      w <- 0 to n
    } yield {
      val m = math.min(w, n - w)
      val cum = (0 to m).map(k => binom(n, k)).sum
      val p = (BigInt(2) * cum * 1000000 + (BigInt(1) << (n - 1))) >> n
      (n.toLong, w.toLong, p.min(1000000).toLong)
    }
  }

  private def binom(n: Int, k: Int): BigInt =
    (1 to k).foldLeft(BigInt(1))((a, i) => a * (n - i + 1) / i)

  /** Two-sided sign test per comparison group — the significance gate an
    * eval leaderboard applies before calling one model better than
    * another: per `pairCol` group, count decisive comparisons and wins of
    * side A, and look up the EXACT binomial p-value from the driver-
    * computed [[signTestTable]] (broadcast: ≤ maxN² rows of literals).
    * `significant = p_ppm < alphaPpm`.
    *
    * Groups larger than `maxN` comparisons are out of the table's domain
    * and are dropped — identically in the oracle (cap the group design,
    * or raise maxN ≤ 62).
    *
    * Scale shape: one map-combined aggregate over the comparison log,
    * then a broadcast lookup join against the literal table. */
  def signTest(matches: DataFrame, pairCol: String, aWin: Column,
      maxN: Int, alphaPpm: Long): DataFrame = {
    val spark = matches.sparkSession
    import spark.implicits._
    val table = broadcast(
      signTestTable(maxN).toDF("__n", "__w", "p_ppm"))
    matches.groupBy(col(pairCol))
      .agg(count(lit(1)).as("n_comparisons"),
        sum(when(aWin, 1L).otherwise(0L)).as("a_wins"))
      .filter(col("n_comparisons") <= maxN.toLong)
      .join(table, col("n_comparisons") === col("__n") &&
        col("a_wins") === col("__w"))
      .withColumn("significant", col("p_ppm") < alphaPpm)
      .select(col(pairCol), col("n_comparisons"), col("a_wins"),
        col("p_ppm"), col("significant"))
  }

  /** Kendall rank correlation between two rankings of the same per-query
    * item set (no ties — both rank columns are row_numbers):
    * τ = (concordant − discordant) / pairs = (pairs − 2·disc) / pairs,
    * in ppm. THE rerank-agreement readout: how much a second route
    * (cross-encoder, semantic) actually reorders the first's shortlist.
    *
    * Input: one row per (query, item) carrying BOTH ranks (the caller
    * inner-joins its two routes). Queries with fewer than two common
    * items carry no pairs and drop out. Output: (queryIdCol, m, n_pairs,
    * n_disc, tau_ppm).
    *
    * Scale shape: the pair frame is a per-query equi-join over
    * shortlist-sized groups — ≤ k(k−1)/2 pairs per query, never corpus ×
    * corpus. */
  def kendallTau(ranked: DataFrame, queryIdCol: String, rankACol: String,
      rankBCol: String): DataFrame = {
    val l = ranked.select(col(queryIdCol).as("__q"),
      col(rankACol).as("__a1"), col(rankBCol).as("__b1"))
    val r = ranked.select(col(queryIdCol).as("__q"),
      col(rankACol).as("__a2"), col(rankBCol).as("__b2"))
    val m = ranked.groupBy(col(queryIdCol).as("__q"))
      .agg(count(lit(1)).as("m"))
    l.join(r, Seq("__q")).filter(col("__a1") < col("__a2"))
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__b1") > col("__b2"), 1L).otherwise(0L)).as("n_disc"))
      .join(m, Seq("__q"))
      .select(col("__q").as(queryIdCol), col("m"), col("n_pairs"),
        col("n_disc"),
        expr("(n_pairs - 2L * n_disc) * 1000000L div n_pairs").as("tau_ppm"))
  }

  /** Shortlist agreement between two retrieval routes (or the same route
    * under two configurations — q241 audits the BM25 df-cutoff): per
    * query, both routes' result counts, the intersection size, and
    * integer Jaccard / containment ratios. [[kendallTau]] compares ORDER
    * over a shared shortlist; this compares MEMBERSHIP when the lists
    * themselves may differ — the recall-style readout for "what did the
    * cheaper configuration drop".
    *
    * Queries present in only one route appear with the other side's
    * count 0 (full-outer on the query id) — a route silently returning
    * nothing is the finding, not a row to drop.
    *
    * Scale shape: both inputs are per-query shortlists (≤k rows per
    * query), so every join here is shortlist-sized. Output: (queryIdCol,
    * n_a, n_b, n_common, jaccard_ppm, containment_ppm) with containment
    * = n_common/n_a (share of the REFERENCE route a retained by b). */
  def overlapAtK(a: DataFrame, b: DataFrame, queryIdCol: String,
      idCol: String): DataFrame = {
    val q = col(queryIdCol)
    val na = a.groupBy(q).agg(count(lit(1)).as("n_a"))
    val nb = b.groupBy(q).agg(count(lit(1)).as("n_b"))
    val common = a.select(q, col(idCol))
      .join(b.select(q, col(idCol)), Seq(queryIdCol, idCol))
      .groupBy(q).agg(count(lit(1)).as("n_common"))
    na.join(nb, Seq(queryIdCol), "full_outer")
      .join(common, Seq(queryIdCol), "left")
      .select(q,
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("jaccard_ppm",
        expr("CASE WHEN n_a + n_b - n_common = 0 THEN null" +
          " ELSE n_common * 1000000L div (n_a + n_b - n_common) END"))
      .withColumn("containment_ppm",
        expr("CASE WHEN n_a = 0 THEN null" +
          " ELSE n_common * 1000000L div n_a END"))
  }
}

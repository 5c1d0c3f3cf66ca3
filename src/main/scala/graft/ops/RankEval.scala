package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}

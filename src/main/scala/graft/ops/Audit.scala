package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forensic data-quality audits over numeric fact columns — Benford
  * first-digit conformance (fabricated-data detection) and Lorenz/Gini
  * concentration (how skewed a corpus or revenue distribution is). Both
  * integer-exact in ppm; both one aggregate over the fact table.
  */
object Audit {

  /** Benford's-law expected first-digit shares, in ppm:
    * floor(log10(1 + 1/d) · 1e6). A compile-time constant table — the law
    * itself, not data. */
  val BenfordPpm: Seq[(String, Long)] = Seq(
    "1" -> 301029L, "2" -> 176091L, "3" -> 124938L, "4" -> 96910L,
    "5" -> 79181L, "6" -> 66946L, "7" -> 57991L, "8" -> 51152L,
    "9" -> 45757L)

  /** First-digit distribution of a positive integer-unit column vs the
    * Benford expectation. Benford is scale-invariant, so auditing the
    * 1e-2/1e-4 integer units audits the underlying amounts.
    *
    * Output: (digit, n, obs_ppm, exp_ppm, dev_ppm) — one row per digit
    * observed. Scale shape: one map-combined 9-group aggregate
    * (lazily checkpointed: it feeds both the grand total and the join —
    * the [[Dedup]] checkpoint-lifetime convention — so the fact scan
    * runs once); the grand total is a 1-row cross join (the q90 scalar
    * class); the expectation is a 9-row literal frame. */
  def benford(df: DataFrame, unitsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val exp = BenfordPpm.toDF("digit", "exp_ppm")
    val counts = df.filter(col(unitsCol) > 0L)
      .select(substring(col(unitsCol).cast("string"), 1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    counts
      .crossJoin(counts.agg(sum(col("n")).as("__tot")))
      .withColumn("obs_ppm", expr("n * 1000000L div __tot"))
      .join(exp, Seq("digit"))
      .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }

  /** Per-group Gini coefficient of a non-negative long-valued column,
    * via the rank formulation G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over
    * values sorted ascending (ties broken by `tieCol` — engine-pinned).
    *
    * Output: (groupCol, n, total, gini_ppm). The ppm divides by the
    * PRE-SCALED denominator (`n·Σx div 1e6`) so the numerator stays in
    * int64 range at any corpus scale (n·Σx itself can pass 2^63 / 1e6);
    * groups too small for the scaled denominator (n·Σx < 1e6) report
    * NULL rather than a fabricated zero.
    *
    * Scale shape: one rank window partitioned by the group (no global
    * sort) and one group aggregate. */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__x").asc, col(tieCol).asc)
    df.select(col(groupCol), col(valueCol).cast("long").as("__x"),
        col(tieCol))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__s1"))
      .select(col(groupCol), col("n"), col("total"),
        when(expr("n * total div 1000000L") === 0L, lit(null))
          .otherwise(expr(
            "(2L * __s1 - (n + 1L) * total) div (n * total div 1000000L)"))
          .cast("long").as("gini_ppm"))
  }

  /** ABC / Pareto classification: entities ranked by descending value,
    * classified by their CUMULATIVE share of the total — A up to
    * `aPpm` (the classic 80%), B up to `bPpm` (95%), C above. The
    * inventory-management classic; in a training-data pipeline it is the
    * "which sources/domains carry the corpus" cut.
    *
    * Output: one row per entity — (keyCol, value, rank, cum_ppm,
    * abc_class). A boundary entity straddling the threshold counts as
    * the HIGHER class (its cumulative share is what first crosses).
    *
    * Scale shape: one keyed rollup to |entities| rows, then the TWO-PHASE
    * global rank + running sum ([[Ids.globalRankCumsum]] — range
    * partition + in-partition sort, per-partition count/sum offsets
    * broadcast as driver metadata, pid-partitioned running-sum window).
    * NO single-partition exchange: the entity frame (~2e9 keys at
    * 100 TB) never funnels through one task, and the grand total falls
    * out of the offset job — no second scan, no total cross join.
    *
    * The share BRANCHES on the total's magnitude (the q191 ratio
    * lesson), on the OVERFLOW bound: numerator-upscale `cum·1e6 div tot`
    * is exact and safe while tot ≤ ⌊2^63/1e6⌋ = 9 223 372 036 854;
    * denominator-downscale `cum div (tot div 1e6)` only above that
    * (where its relative error is ≤ 1e6/tot ≤ 1.1e-7). The total is a
    * driver literal, so the branch is resolved at plan time and the
    * oracle SQL mirrors the same CASE on the same data — the hash stays
    * exact. */
  def abcClassification(facts: DataFrame, keyCol: String, valueCol: String,
      aPpm: Long = 800000L, bPpm: Long = 950000L): DataFrame = {
    require(aPpm >= 1 && aPpm < bPpm && bPpm <= 1000000L)
    val per = facts.groupBy(col(keyCol))
      .agg(sum(col(valueCol).cast("long")).as("value"))
    val (ranked, tot, _) = Ids.globalRankCumsum(per,
      Seq(col("value").desc, col(keyCol).asc), "value", "rank", "__cum")
    val cumPpm =
      if (tot <= 0L) lit(null).cast("long")
      else if (tot <= 9223372036854L) expr(s"__cum * 1000000L div ${tot}L")
      else expr(s"__cum div ${tot / 1000000L}L")
    ranked
      .withColumn("cum_ppm", cumPpm)
      .withColumn("abc_class",
        when(col("cum_ppm") <= aPpm, "A")
          .when(col("cum_ppm") <= bPpm, "B").otherwise("C"))
      .select(col(keyCol), col("value"), col("rank"), col("cum_ppm"),
        col("abc_class"))
  }

  /** GLOBAL Gini coefficient — [[giniByGroup]] without the group key,
    * over a frame that scales with the corpus (per-user totals, per-doc
    * sizes), where the per-group spelling's window would need a
    * partition. Rank formulation over values ascending (ties by
    * `tieCol`): G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx).
    *
    * Scale shape: the rank comes from the two-phase
    * [[Ids.globalRankCumsum]] (no single-partition exchange; n and Σx
    * are driver literals), then ONE map-side-combined aggregate for
    * Σ i·xᵢ. That sum accumulates in decimal(38,0) — i·x reaches n²·x̄/2,
    * past int64 for any corpus-scale frame — and the final ppm divides
    * once (DuckDB mirrors via its native HUGEINT sum).
    *
    * Output: one row — (n, total, gini_ppm); gini_ppm NULL when
    * n·Σx = 0 (the giniByGroup convention). */
  def giniGlobal(df: DataFrame, valueCol: String, tieCol: String): DataFrame = {
    val base = df.select(col(valueCol).cast("long").as("__x"), col(tieCol))
    val (ranked, tot, n) = Ids.globalRankCumsum(base,
      Seq(col("__x").asc, col(tieCol).asc), "__x", "__i", "__c")
    val giniPpm =
      if (n <= 0L || tot <= 0L) lit(null).cast("long")
      else expr(s"cast((2 * sum(cast(__i as decimal(38,0)) * __x)" +
        s" - cast(${n + 1L} as decimal(38,0)) * ${tot}L) * 1000000" +
        s" div (cast(${n}L as decimal(38,0)) * ${tot}L) as long)")
    ranked.agg(lit(n).as("n"), lit(tot).as("total"), giniPpm.as("gini_ppm"))
  }

  /** Coverage-depth report: for each requested cumulative-share
    * threshold, HOW MANY top entities it takes to cover that share of
    * the total — "how many domains until 90% of the corpus tokens".
    * The inverse readout of [[lorenzCurve]] (that fixes rank buckets and
    * reports shares; this fixes shares and reports depths).
    *
    * Scale shape: keyed rollup → two-phase rank/cumsum → ONE aggregate
    * with a conditional min per threshold, reshaped by a literal stack.
    * Each threshold's target value `ceil(tot·t/1e6)` is computed on the
    * driver in BigInt (tot is a literal), so no in-plan product can
    * overflow at any total.
    *
    * Output: (threshold_ppm, entities_needed, value_covered) per
    * threshold, ascending; a threshold no prefix reaches (only possible
    * at t=0 input edge) reports NULLs. */
  def coverageDepth(facts: DataFrame, keyCol: String, valueCol: String,
      thresholdsPpm: Seq[Long]): DataFrame = {
    require(thresholdsPpm.nonEmpty &&
      thresholdsPpm.forall(t => t >= 1 && t <= 1000000L))
    val per = facts.groupBy(col(keyCol))
      .agg(sum(col(valueCol).cast("long")).as("value"))
    val (ranked, tot, _) = Ids.globalRankCumsum(per,
      Seq(col("value").desc, col(keyCol).asc), "value", "__rank", "__cum")
    val ts = thresholdsPpm.distinct.sorted
    val targets = ts.map(t =>
      ((BigInt(tot) * t + 999999) / 1000000).toLong)
    val aggs = ts.zip(targets).flatMap { case (t, tgt) => Seq(
      min(when(col("__cum") >= tgt, col("__rank"))).as(s"__e_$t"),
      min(when(col("__cum") >= tgt, col("__cum"))).as(s"__v_$t")) }
    val one = ranked.agg(aggs.head, aggs.tail: _*)
    val stack = ts.map(t => s"${t}L, __e_$t, __v_$t").mkString(", ")
    one.select(expr(s"stack(${ts.size}, $stack)" +
      " as (threshold_ppm, entities_needed, value_covered)"))
  }

  /** Lorenz concentration curve in `nBuckets` rank buckets — the
    * [[giniByGroup]] readout as a TABLE: entities ranked by descending
    * value, bucket b = ceil(rank·B/n), per bucket the entity count, value
    * sum, and the CUMULATIVE value share at the bucket's lower edge —
    * "the top 5% of sources hold X% of the tokens", at any corpus size.
    *
    * Scale shape: one keyed rollup, then the q216 two-phase
    * [[Ids.globalRankCumsum]] (rank + running sum, no single-partition
    * exchange; n and the grand total come back as driver literals), then
    * a B-row aggregate. The share uses the abcClassification magnitude
    * branch (exact through tot ≤ 9.2e12, ≤1.1e-7 relative above).
    *
    * Output: (bucket, n_entities, value_sum, cum_value, cum_share_ppm),
    * bucket ascending 1..B (bucket 1 = highest-value entities). */
  def lorenzCurve(facts: DataFrame, keyCol: String, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1)
    val per = facts.groupBy(col(keyCol))
      .agg(sum(col(valueCol).cast("long")).as("value"))
    val (ranked, tot, n) = Ids.globalRankCumsum(per,
      Seq(col("value").desc, col(keyCol).asc), "value", "__rank", "__cum")
    val share =
      if (tot <= 0L) lit(null).cast("long")
      else if (tot <= 9223372036854L) expr(s"cum_value * 1000000L div ${tot}L")
      else expr(s"cum_value div ${tot / 1000000L}L")
    ranked
      .withColumn("bucket",
        expr(s"(__rank * ${nBuckets}L + ${n}L - 1L) div ${math.max(n, 1L)}L"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_entities"), sum(col("value")).as("value_sum"),
        max(col("__cum")).as("cum_value"))
      .withColumn("cum_share_ppm", share)
  }

  /** Parent/child referential-integrity and amount reconciliation — the
    * nightly warehouse audit: orphaned children (no parent), childless
    * parents, and parents whose recorded total disagrees with the sum of
    * their children beyond `toleranceE2` integer cents.
    *
    * Output: one row per issue — (issue, entity_key, detail_e2) with
    * issue ∈ {orphan_child, childless_parent, amount_mismatch};
    * `detail_e2` is the child count for orphans (always from one child
    * key's perspective: rows), 0 for childless, and the signed
    * difference (recorded − derived) for mismatches.
    *
    * Scale shape: children collapse to a per-parent aggregate first, so
    * the full-outer join is |parents| + |parent-keys-in-children| rows —
    * never row-level fact × fact. */
  def reconcile(parents: DataFrame, children: DataFrame,
      parentKey: String, childFk: String, parentAmount: String,
      childAmount: String, toleranceE2: Long): DataFrame = {
    val p = parents.select(col(parentKey).as("__k"),
      round(col(parentAmount) * 100).cast("long").as("__pa"))
    val c = children
      .select(col(childFk).as("__k"),
        round(col(childAmount) * 100).cast("long").as("__ca"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"), sum(col("__ca")).as("__csum"))
    val j = p.join(c, Seq("__k"), "full_outer")
    val orphans = j.filter(col("__pa").isNull)
      .select(lit("orphan_child").as("issue"), col("__k").as("entity_key"),
        col("__n").as("detail_e2"))
    val childless = j.filter(col("__pa").isNotNull && col("__n").isNull)
      .select(lit("childless_parent").as("issue"),
        col("__k").as("entity_key"), lit(0L).as("detail_e2"))
    val mismatch = j
      .filter(col("__pa").isNotNull && col("__n").isNotNull &&
        abs(col("__pa") - col("__csum")) > toleranceE2)
      .select(lit("amount_mismatch").as("issue"),
        col("__k").as("entity_key"),
        (col("__pa") - col("__csum")).as("detail_e2"))
    orphans.unionByName(childless).unionByName(mismatch)
  }

  /** Chi-square uniformity audit of the deterministic md5 sampler
    * (q56's splitter): keys hashed into `k` buckets, observed counts
    * tested against the uniform expectation. A skewed sampler silently
    * biases every hash-carved train/eval split, so the splitter itself
    * needs a QC gate. χ² = Σ(k·o − n)² / (k·n) — the (o − n/k)²/(n/k)
    * classic cleared of fractions, integer-exact; unseen buckets enter
    * as (k − seen)·n² so an empty bucket is counted, not ignored.
    *
    * The squared deviations accumulate in decimal(38,0) — the DEGENERATE
    * sampler this audit exists to flag produces |k·o − n| ≈ k·n, whose
    * square crosses 2^63 at n ≈ 5e4 already (int64 arithmetic would
    * abort in both engines right when the answer matters; DuckDB's
    * sum(BIGINT) is HUGEINT natively). Exact through
    * Σd²·1e6 ≤ 1e38, i.e. total skew at n ≈ 1.4e14 rows — two orders
    * past a 100 TB corpus' row count. The final `div` floors once, as
    * before.
    *
    * Output: one row — (n, k, buckets_seen, chi2_e6, dof). Healthy ≈
    * dof·1e6 (mean of the χ² distribution). Scale shape: one k-group
    * map-combined aggregate + a 1-row total. */
  def samplerUniformity(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2)
    // the ≤k-row bucket histogram feeds both the total and the χ² rollup
    // — checkpoint so the fact scan + md5 kernel run once (Dedup note)
    val b = df.select(pmod(graft.functions.HashFns.md5Long(key, 8),
        lit(k.toLong)).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__o"))
      .localCheckpoint(false)
    // d = k·o − n as decimal BEFORE the square (k·o alone passes 2^63 at
    // o ≈ 1.4e17 — cast first so the bound is the documented Σd² one)
    val d = s"($k * cast(__o as decimal(38,0)) - __n)"
    b.crossJoin(b.agg(sum(col("__o")).as("__n")))
      .agg(min(col("__n")).as("n"),
        lit(k.toLong).as("k"),
        count(lit(1)).as("buckets_seen"),
        expr(s"cast((sum($d * $d)" +
          s" + cast($k - count(1) as decimal(38,0)) * min(__n) * min(__n))" +
          s" * 1000000 div (cast($k as decimal(38,0)) * min(__n)) as long)")
          .as("chi2_e6"),
        lit(k.toLong - 1).as("dof"))
  }

  /** Vector-store integrity audit: documents vs their embedding rows —
    * matched/missing on each side, off-dimension vectors (vs the MODAL
    * dimension, derived from the data: highest count, ties to the
    * smaller), and non-finite vectors. The non-finite probe rides on
    * array_max/array_min (codegen'd; NaN orders greatest in both
    * engines), not a per-element interpreted lambda.
    *
    * Output: one row — (n_docs, n_vectors, n_matched, n_doc_only,
    * n_vec_only, modal_dim, n_dim_anomaly, n_nonfinite). Scale shape:
    * per-row constant work, one full-outer equi-join on the id, three
    * 1-row aggregates cross-joined. */
  def vectorStoreAudit(docs: DataFrame, docIdCol: String,
      vectors: DataFrame, vecIdCol: String, embCol: String): DataFrame = {
    val d = docs.select(col(docIdCol).as("__id"), lit(1L).as("__doc"))
    val v = vectors.select(col(vecIdCol).as("__id"), lit(1L).as("__vec"),
      size(col(embCol)).cast("long").as("__dim"),
      (isnan(array_max(col(embCol))) ||
        array_max(col(embCol)) === lit(Float.PositiveInfinity) ||
        array_min(col(embCol)) === lit(Float.NegativeInfinity))
        .as("__bad"))
    val modal = v.groupBy(col("__dim")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__dim").asc).limit(1)
      .select(col("__dim").as("modal_dim"))
    val joined = d.join(v, Seq("__id"), "full_outer").crossJoin(modal)
    joined.agg(
      sum(coalesce(col("__doc"), lit(0L))).as("n_docs"),
      sum(coalesce(col("__vec"), lit(0L))).as("n_vectors"),
      sum(when(col("__doc").isNotNull && col("__vec").isNotNull, 1L)
        .otherwise(0L)).as("n_matched"),
      sum(when(col("__vec").isNull, 1L).otherwise(0L)).as("n_doc_only"),
      sum(when(col("__doc").isNull, 1L).otherwise(0L)).as("n_vec_only"),
      min(col("modal_dim")).as("modal_dim"),
      sum(when(col("__dim").isNotNull && col("__dim") =!= col("modal_dim"),
        1L).otherwise(0L)).as("n_dim_anomaly"),
      sum(when(col("__bad"), 1L).otherwise(0L)).as("n_nonfinite"))
  }
}

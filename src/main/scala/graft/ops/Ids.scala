package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stable global row identifiers — a training-data pipeline needs dense,
  * deterministic example ids (shard manifests, curriculum order, resumable
  * exports), and none of the quick spellings survive 100 TB:
  *
  *  - `monotonically_increasing_id` ALONE encodes the partition id —
  *    values change whenever partitioning does, and they are not dense;
  *  - `row_number()` over a window with NO partition clause funnels the
  *    ENTIRE dataset through one task (the classic single-reducer
  *    bottleneck).
  *
  * [[globalIndex]] is the scale-correct two-phase form.
  */
object Ids {

  /** Dense 0-based global index in total `orderCols` order (make the key
    * total — append a unique tiebreak — or ids are nondeterministic, the
    * same rule every window in this repo follows). Null placement follows
    * the passed Columns (Spark's bare `asc` is NULLS FIRST — the opposite
    * of e.g. DuckDB's default; pass `asc_nulls_last` or pin the consumer
    * side when cross-engine agreement on nullable keys matters).
    *
    * Phase 1 range-repartitions and sorts by the key (one shuffle, the
    * same cost any global ordering pays), then PINS the physical RDD
    * (`toRdd` + graftbridge): range bounds are sampled with a seed derived
    * from the RDD id, so two independently-planned actions would disagree
    * on the layout — every job below runs against the one captured
    * instance (and reuses its shuffle files). Phase 2 counts rows per
    * sorted partition (one lightweight pass over Tungsten rows — no field
    * access, no deserialization; the same count `zipWithIndex` runs),
    * turns the counts into per-partition start offsets on the driver
    * (bounded metadata: one long per partition), and assigns
    * `offset(pid) + position-in-partition` as a plain codegen'd
    * PROJECTION — the local position is the low 33 bits of
    * `monotonically_increasing_id` (its documented layout: partition id in
    * the upper bits, 0-based record position within the partition below) —
    * instead of the external-Row `rdd.zipWithIndex` round-trip that
    * deserialized every row out of Tungsten. Requires < 2^33 rows per
    * partition, which any sane partitioning satisfies.
    *
    * Because the order is total, the assigned ids equal
    * `row_number() OVER (ORDER BY key) - 1` REGARDLESS of how the range
    * bounds fell, so results are rerun-stable even under different
    * partition counts.
    */
  def globalIndex(df: DataFrame, orderCols: Seq[Column], outCol: String,
      numPartitions: Option[Int] = None): DataFrame = {
    val parts = numPartitions.getOrElse(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt)
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val rdd = sorted.queryExecution.toRdd // bounds + shuffle materialize once
    val counts = rdd.sparkContext.runJob(rdd,
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      })
    val offsets: Seq[Long] = counts.toSeq.scanLeft(0L)(_ + _).init
    val base = org.apache.spark.sql.graftbridge.Bridge
      .dataFrameFromInternalRdd(df.sparkSession, rdd, sorted.schema)
    val local = monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))
    val offset = element_at(typedLit(offsets), spark_partition_id() + 1)
    base.withColumn(outCol, (offset + local).cast("long"))
  }

  /** Deterministic DENSE numeric surrogate for a key column — the helper
    * [[graft.ops.Rag]]'s `requireIntegralDocId` contract implies (r15
    * verdict: the groundedness ops refuse string doc-ids and tell callers
    * to "map string ids to a numeric surrogate first", but the repo
    * provided no such op, so every caller hand-rolled the mapping and
    * risked collisions or nondeterminism). Distinct keys are ranked in
    * total key order by the two-phase [[globalIndex]] (no single-task
    * window, no hash collisions — surrogates are 0-based, DENSE, and
    * rerun-stable: equal inputs give equal surrogates under any partition
    * count) and joined back onto the frame.
    *
    * The 0-based domain never collides with the groundedness family's −1
    * "no support" sentinel. NULL keys are DROPPED (an equi-join never
    * matches null — a null document identity has nothing to cite);
    * coalesce upstream if null must be a citable value. Cost: one
    * distinct shuffle over the key + [[globalIndex]]'s range shuffle on
    * the (distinct, so strictly smaller) key frame + one key equi-join —
    * all key-width shuffles, no document bodies. */
  def surrogateKey(df: DataFrame, keyCol: String, outCol: String): DataFrame = {
    // nulls are dropped by the equi-join below anyway — filter them BEFORE
    // ranking so they don't occupy a surrogate slot (Spark's asc is NULLS
    // FIRST: an unfiltered null would take 0 and shift every real key)
    val keys = df.select(col(keyCol))
      .filter(col(keyCol).isNotNull).distinct()
    val ranked = globalIndex(keys, Seq(col(keyCol).asc), outCol)
    df.join(ranked, Seq(keyCol))
  }

  /** [[globalIndex]] extended with a global RUNNING SUM of a long-valued
    * column — global rank (1-based) AND cumulative total in one two-phase
    * pass, for Pareto/ABC-style "cumulative share in rank order" analytics
    * where `row_number().over(Window.orderBy(...))` would funnel the whole
    * frame through one task.
    *
    * Phase 1 is [[globalIndex]]'s: range-repartition + in-partition sort by
    * the (total — append a unique tiebreak) key, pin the physical RDD so
    * every job below shares the sampled range bounds. Phase 2's count job
    * additionally sums `valueCol` per sorted partition (nulls add 0), giving
    * the driver BOTH per-partition row-count offsets and per-partition SUM
    * offsets — bounded metadata, two longs per partition. The assignment
    * pass is then:
    *
    *  - `rankOut` = countOffset(pid) + position-in-partition + 1 — a plain
    *    codegen'd projection (the `monotonically_increasing_id` low-33-bits
    *    layout, as in [[globalIndex]]);
    *  - `cumOut`  = sumOffset(pid) + running sum WITHIN the partition — a
    *    window PARTITIONED by the captured partition id, so its exchange
    *    hashes on pid (one group per range partition, each bounded by the
    *    range partitioner — parallelism preserved at any frame size; the
    *    per-group sort is by the already-materialized local position).
    *
    * No single-partition exchange appears anywhere in the plan (PlanSpec
    * asserts this on q216's executed plan). Because the order is total, the
    * outputs equal `row_number()/sum() OVER (ORDER BY key)` regardless of
    * how the range bounds fell.
    *
    * Returns the annotated frame AND the grand totals — Σvalue and the
    * row count, both already computed by the count job — so callers
    * needing a "share of total" or a target rank divide/compare against
    * driver literals instead of cross-joining a second aggregation of the
    * input (one fewer scan).
    *
    * `valueCol` must be LongType (the repo's integer-exact convention).
    * Overflow posture: every addition on the way to the grand total — the
    * per-partition scan sums AND the driver-side prefix scan over them —
    * is `Math.addExact`, so a frame whose running sum crosses ±2^63 FAILS
    * LOUDLY (ArithmeticException naming the column) instead of silently
    * wrapping into a plausible-looking rank table; this primitive
    * underpins the overflow-audit family (abcClassification, giniGlobal,
    * joinAmplification's consumers), which exists precisely for inputs
    * where "the caller's contract" breaks. The phase-3 in-partition
    * running sum is a Spark `sum(long)` under ANSI mode, which throws on
    * overflow too — so the bound is exact end to end: any input whose
    * true running sum fits int64 succeeds; any input where it doesn't
    * raises. The method REQUIRES `spark.sql.ansi.enabled=true` (Spark 4's
    * default) and refuses to run otherwise — a non-ANSI consumer session
    * would keep phases 1-2 loud while phase 3 silently wrapped, an
    * inconsistent failure mode for the audit-family primitive (IdsSpec
    * pins the refusal). */
  def globalRankCumsum(df: DataFrame, orderCols: Seq[Column], valueCol: String,
      rankOut: String, cumOut: String,
      numPartitions: Option[Int] = None): (DataFrame, Long, Long) = {
    // the loud-overflow contract above is only end-to-end when phase 3's
    // in-partition window sum throws too — that is ANSI behavior. Phases
    // 1-2 are Math.addExact regardless of session conf, so a non-ANSI
    // session would get an INCONSISTENT failure mode (loud grand total,
    // silently wrapped cum column); refuse up front instead.
    require(df.sparkSession.conf.get("spark.sql.ansi.enabled", "true")
        .toBoolean,
      "globalRankCumsum requires spark.sql.ansi.enabled=true: its " +
        "overflow contract (a running sum crossing +/-2^63 fails loudly) " +
        "depends on ANSI arithmetic for the in-partition window sum")
    val parts = numPartitions.getOrElse(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt)
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema
    val vIdx = schema.fieldIndex(valueCol)
    require(schema(vIdx).dataType == org.apache.spark.sql.types.LongType,
      s"globalRankCumsum needs a LongType value column, " +
        s"got ${schema(vIdx).dataType} for $valueCol")
    val rdd = sorted.queryExecution.toRdd // bounds + shuffle materialize once
    val colName = valueCol // avoid capturing `this`-adjacent refs in the task
    val stats = rdd.sparkContext.runJob(rdd,
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        var n = 0L; var s = 0L
        while (it.hasNext) {
          val r = it.next(); n += 1
          if (!r.isNullAt(vIdx)) {
            try s = Math.addExact(s, r.getLong(vIdx))
            catch { case _: ArithmeticException =>
              throw new ArithmeticException(
                s"globalRankCumsum: partial sum of '$colName' overflowed " +
                  "int64 within one range partition - the running cumsum " +
                  "cannot be represented; rescale the value column " +
                  "(coarser units) or sum in decimal upstream") }
          }
        }
        (n, s)
      })
    val cntOff: Seq[Long] = stats.map(_._1).toSeq.scanLeft(0L)(_ + _).init
    // driver prefix scan over per-partition sums: same loud-overflow rule
    // (partitions can be individually fine while the global prefix wraps)
    val sumScan: Seq[Long] = stats.map(_._2).toSeq.scanLeft(0L) { (a, b) =>
      try Math.addExact(a, b)
      catch { case _: ArithmeticException =>
        throw new ArithmeticException(
          s"globalRankCumsum: global running sum of '$colName' overflowed " +
            "int64 across partitions - rescale the value column") }
    }
    val total = sumScan.last
    val nRows = stats.map(_._1).sum
    val base = org.apache.spark.sql.graftbridge.Bridge
      .dataFrameFromInternalRdd(df.sparkSession, rdd, schema)
    val local = monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))
    // pid + local position materialize BEFORE the window's pid-hash
    // exchange (nondeterministic expressions pin the Project below it)
    val staged = base
      .withColumn("__gr_pid", org.apache.spark.sql.functions.spark_partition_id())
      .withColumn("__gr_pos", local)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__gr_pid")).orderBy(col("__gr_pos").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val out = staged
      .withColumn(rankOut,
        (element_at(typedLit(cntOff), col("__gr_pid") + 1) +
          col("__gr_pos") + lit(1L)).cast("long"))
      .withColumn(cumOut,
        (element_at(typedLit(sumScan.init), col("__gr_pid") + 1) +
          coalesce(sum(col(valueCol)).over(w), lit(0L))).cast("long"))
      .drop("__gr_pid", "__gr_pos")
    (out, total, nRows)
  }
}

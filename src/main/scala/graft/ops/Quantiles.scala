package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT quantiles — the corpus-profiling aggregate (per-group
  * p50/p90/p99 + extrema) without the scale trap of `percentile(...)`.
  *
  * Spark's exact `percentile` (like DuckDB's `quantile_cont`) is an
  * ImperativeAggregate whose buffer holds every (value, count) pair of the
  * group — for a group that is "all documents in a language", that is an
  * unbounded single-task buffer at 100 TB. The approximate path
  * (`percentile_approx`) bounds the buffer but gives up exactness.
  *
  * This operator keeps BOTH: it computes the same type-7 linear
  * interpolation (`rank = p·(n−1)`, the Hive/DuckDB convention) from a
  * VALUE HISTOGRAM, so every structure is bounded by the value domain's
  * cardinality, never by row count:
  *
  *  1. `groupBy(group, value).count()` — one map-side-combined shuffle of
  *     at most |groups|·|distinct values| rows (a length column's domain
  *     is ~1e6 whatever the corpus size);
  *  2. per-group running counts over the histogram (a window whose
  *     partitions are |distinct values| rows, not |rows|);
  *  3. for each requested p, the two bracketing values are the histogram
  *     rows whose cumulative range covers `floor(r)` / `floor(r)+1` — a
  *     map-side filter, then a |groups|·|ps|-row aggregation.
  *
  * Values land at double precision and interpolate with the built-in
  * Percentile's exact spelling — `(ceil(r)−r)·lo + (r−floor(r))·hi`, and
  * the bracketing value alone when r is integral — so results are
  * bit-identical to `percentile(...)` (QuantilesSpec asserts equality).
  *
  * Null values are excluded from ranks (aggregate semantics) but counted
  * in `n_rows`; a group whose values are ALL null disappears from the
  * output (the built-in would emit a null quantile array — don't profile
  * a column that is entirely null).
  */
object Quantiles {

  /** Per-group profile: `(group, n_rows, quantiles array<double>, vmin,
    * vmax)` with `quantiles(i)` the exact `ps(i)`-quantile of `valueCol`.
    */
  def profile(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1], got $ps")
    val g = col(groupCol)
    val v = col(valueCol)
    val hist = df.groupBy(g, v).agg(count(lit(1)).as("__cnt"))
    val whole = Window.partitionBy(g)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val running = Window.partitionBy(g).orderBy(v.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      // totals BEFORE the null filter: n_rows counts null-valued rows too,
      // exactly as count(*) alongside a percentile aggregate would
      .withColumn("__n_all", sum(col("__cnt")).over(whole))
      .withColumn("__vmin", min(v).over(whole))
      .withColumn("__vmax", max(v).over(whole))
      .filter(v.isNotNull)
      .withColumn("__n", sum(col("__cnt")).over(whole))
      .withColumn("__cum", sum(col("__cnt")).over(running))
      .withColumn("__pcum", col("__cum") - col("__cnt"))
    val qArr = array(ps.zipWithIndex.map { case (p, i) =>
      struct(lit(i).as("i"), lit(p).as("p")) }: _*)
    // a histogram row covers sorted indices [pcum, cum); the p-quantile
    // brackets are the rows covering k = floor(p·(n−1)) and k+1 (clamped)
    val e = ranked.select(g, col("__n_all"), col("__vmin"), col("__vmax"),
        v.cast("double").as("__v"), col("__n"), col("__cum"), col("__pcum"),
        explode(qArr).as("__q"))
      .withColumn("__r", col("__q.p") * (col("__n") - 1).cast("double"))
      .withColumn("__k", floor(col("__r")).cast("long"))
      .withColumn("__k2", least(col("__k") + 1, col("__n") - 1))
      .select(g, col("__q.i").as("__i"), col("__n_all"), col("__vmin"),
        col("__vmax"), col("__r"), col("__k"),
        when(col("__pcum") <= col("__k") && col("__k") < col("__cum"),
          col("__v")).as("__lo"),
        when(col("__pcum") <= col("__k2") && col("__k2") < col("__cum"),
          col("__v")).as("__hi"))
      .filter(col("__lo").isNotNull || col("__hi").isNotNull)
    val perQuantile = e.groupBy(g, col("__i"))
      .agg(first(col("__n_all")).as("__n_all"),
        first(col("__vmin")).as("__vmin"), first(col("__vmax")).as("__vmax"),
        first(col("__r")).as("__r"), first(col("__k")).as("__k"),
        max(col("__lo")).as("__lo"), max(col("__hi")).as("__hi"))
      .withColumn("__qv",
        when(col("__r") === col("__k").cast("double"), col("__lo"))
          .otherwise(
            ((col("__k") + 1).cast("double") - col("__r")) * col("__lo") +
              (col("__r") - col("__k").cast("double")) * col("__hi")))
    perQuantile.groupBy(g)
      .agg(first(col("__n_all")).as("n_rows"),
        transform(array_sort(collect_list(struct(col("__i"), col("__qv")))),
          x => x.getField("__qv")).as("quantiles"),
        first(col("__vmin")).as("vmin"),
        first(col("__vmax")).as("vmax"))
  }

  /** Pooled-decile calibration mix: each group's share of rows landing in
    * every decile of the POOLED integer-score distribution — the
    * cross-source score-calibration table (a source whose mass piles into
    * pooled deciles 1–2 is scored harshly relative to the pool; q189
    * calibrates ONE cutoff per group, this shows the whole mix).
    *
    * Decile cutoffs are exact rank-ceil percentiles via the q189
    * histogram-cumulative spelling: windows run over the DISTINCT-score
    * frame (bounded by the value domain, never a corpus-length sort
    * partition); cutoff d = min score with `cum·10 ≥ n·d`. A row's decile
    * is `1 + Σ_d [score > cutoff_d]` — boundary ties stay in the lower
    * decile, identical in any engine. The 9 cutoffs join back as ONE
    * broadcast row.
    *
    * Output: (groupCol, decile, n, share_ppm) with share per group. */
  def pooledDecileMix(df: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    val scores = df.select(col(groupCol), col(scoreCol).cast("long").as("__s"))
    val hist = scores.groupBy(col("__s")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        Window.orderBy(col("__s").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val cutoffCols = (1 to 9).map(d =>
      min(when(col("__cum") * 10L >= col("__n") * d, col("__s")))
        .as(s"__q$d"))
    val cutoffs = hist.agg(cutoffCols.head, cutoffCols.tail: _*)
    val decile = (1 to 9).map(d => when(col("__s") > col(s"__q$d"), 1L)
      .otherwise(0L)).reduce(_ + _) + 1L
    scores.crossJoin(broadcast(cutoffs))
      .withColumn("decile", decile)
      .groupBy(col(groupCol), col("decile"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__gn", sum(col("n")).over(
        Window.partitionBy(col(groupCol))))
      .withColumn("share_ppm", expr("n * 1000000L div __gn"))
      .drop("__gn")
  }

  /** Exact GLOBAL order statistics of an UNBOUNDED-domain column — the
    * complement of [[profile]] (whose histogram windows need a value
    * domain smaller than the row count; per-user monetary totals or raw
    * byte sizes are nearly all-distinct, where the histogram IS the
    * frame). For each requested integer percentile p the exact rank-ceil
    * statistic: the value at rank ⌈p·n/100⌉ in (value, tie) ascending
    * order (p=100 → the max).
    *
    * Scale shape: one [[Ids.globalIndex]]-style two-phase pass
    * ([[Ids.globalRankCumsum]] with a constant weight — the count job
    * returns n, so no separate count() action), then a map-side filter to
    * the ≤|ps| target ranks and a broadcast join against the (p, rank)
    * literal frame. No single-partition exchange, no per-group value
    * buffer.
    *
    * Output: (p, rank, value-typed column named `valueCol`), one row per
    * requested p, p ascending. Empty input → empty output. */
  def orderStatistics(df: DataFrame, valueCol: String, tieCol: String,
      ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100))
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(valueCol), col(tieCol), lit(1L).as("__one"))
    val (ranked, _, n) = Ids.globalRankCumsum(base,
      Seq(col(valueCol).asc, col(tieCol).asc), "__one", "rank", "__c")
    val targets = ps.distinct.sorted
      .map(p => (p.toLong, (p.toLong * n + 99L) / 100L)).toDF("p", "rank")
    ranked
      .join(broadcast(targets), Seq("rank"))
      .select(col("p"), col("rank"), col(valueCol))
  }

  /** WEIGHTED exact order statistics: the value at which the cumulative
    * WEIGHT first reaches p% of the total — "the median token lives in a
    * document of length X" (value = doc length, weight = token count),
    * the cost-weighted latency percentile, the byte-weighted shard size.
    * Plain [[orderStatistics]] is the weight ≡ 1 special case.
    *
    * Scale shape: one [[Ids.globalRankCumsum]] over (value, tie)
    * ascending accumulating the weight, targets `ceil(W·p/100)` computed
    * driver-side in BigInt from the literal total, then ONE aggregate
    * with a conditional min per p, reshaped by a literal stack — the
    * [[graft.ops.Audit.coverageDepth]] shape.
    *
    * Output: (p, target_weight, value-typed `valueCol`), p ascending.
    * Zero-weight rows never host a cutoff (the cumulative is flat across
    * them and `min` picks the first value AT which the target is met,
    * which is the same value the next positive-weight row carries only
    * if values tie — boundary semantics identical in both engines). */
  def weightedOrderStatistics(df: DataFrame, valueCol: String,
      weightCol: String, tieCol: String, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100))
    val base = df.select(col(valueCol), col(tieCol),
      col(weightCol).cast("long").as("__w"))
    val (ranked, totW, _) = Ids.globalRankCumsum(base,
      Seq(col(valueCol).asc, col(tieCol).asc), "__w", "__rk", "__cw")
    val ts = ps.distinct.sorted
    val targets = ts.map(p => ((BigInt(totW) * p + 99) / 100).toLong)
    val aggs = ts.zip(targets).map { case (p, tgt) =>
      min(when(col("__cw") >= tgt, col(valueCol))).as(s"__v_$p") }
    val one = ranked.agg(aggs.head, aggs.tail: _*)
    val stack = ts.zip(targets)
      .map { case (p, tgt) => s"${p}L, ${tgt}L, __v_$p" }.mkString(", ")
    one.select(expr(
      s"stack(${ts.size}, $stack) as (p, target_weight, $valueCol)"))
  }

  /** Exact-rank k-tile bucket assignment — the scale-safe replacement for
    * `ntile(k)` over an unbounded frame, for one or several metrics of the
    * same frame at once (the RFM grid's R/F/M quintiles).
    *
    * For each `(metricCol, outCol)` the cutoffs are the q189/
    * [[pooledDecileMix]] exact-rank percentiles — cutoff q = min metric
    * value whose cumulative row count satisfies `cum·k ≥ n·q` — and a
    * row's bucket is `1 + Σ_q [metric > cutoff_q]`, so buckets run 1..k
    * ascending in the metric. Descending semantics (RFM recency): pass the
    * NEGATED metric.
    *
    * Tie semantics differ from `ntile` BY DESIGN: equal metric values
    * always share a bucket (ntile splits ties across the boundary by row
    * order), which is both the analytically meaningful cut and the only
    * engine-portable one. Bucket populations are therefore k-quantile up
    * to tie mass, not exactly equal.
    *
    * Scale shape: the input is lazily checkpointed ONCE to feed the
    * histogram jobs (one per metric — Catalyst shares no subtrees across
    * branches, see the [[graft.ops.Dedup]] checkpoint-lifetime note), and
    * the pinned blocks are RELEASED before returning
    * ([[org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint]])
    * — a long-lived session calling this repeatedly accumulates no
    * executor storage. Each metric costs one map-combined distinct-value
    * histogram and one [[Ids.globalRankCumsum]] over it — the histogram's
    * running count never passes through a single-partition window, so the
    * spelling survives metrics whose value domain scales with the frame
    * (per-user monetary totals are nearly all-distinct). The k−1 cutoffs
    * per metric are each one `min` aggregate — ≤ k−1 scalars, collected
    * to the driver and baked into the output as LITERALS, so the returned
    * frame is the caller's frame plus plain codegen'd projections (no
    * crossJoin, no dependence on the released checkpoint; the one cost is
    * that the final action re-evaluates the caller's lineage once, the
    * standard storage-vs-rescan trade). */
  def rankBuckets(df: DataFrame, metrics: Seq[(String, String)],
      k: Int): DataFrame = {
    require(k >= 2 && metrics.nonEmpty)
    val base = df.localCheckpoint(false)
    val cuts: Seq[(String, String, Seq[Column])] =
      metrics.map { case (valueCol, outCol) =>
        val hist = base.groupBy(col(valueCol).as("__s"))
          .agg(count(lit(1)).as("__c"))
        val (cumHist, n, _) = Ids.globalRankCumsum(hist,
          Seq(col("__s").asc), "__c", "__hrk", "__cum")
        val cutoffCols = (1 until k).map(q =>
          min(when(col("__cum") * k >= lit(n) * q, col("__s")))
            .as(s"__cut_$q"))
        val row = cumHist.agg(cutoffCols.head, cutoffCols.tail: _*).head()
        val dt = df.schema(df.schema.fieldIndex(valueCol)).dataType
        val lits = (0 until k - 1).map(i =>
          if (row.isNullAt(i)) lit(null).cast(dt) else lit(row.get(i)))
        (valueCol, outCol, lits)
      }
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(base)
    cuts.foldLeft(df) { case (acc, (valueCol, outCol, lits)) =>
      val bucket = lits.map(cv =>
        when(col(valueCol) > cv, 1L).otherwise(0L)).reduce(_ + _) + lit(1L)
      acc.withColumn(outCol, bucket)
    }
  }
}

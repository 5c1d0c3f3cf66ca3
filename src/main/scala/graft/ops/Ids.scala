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
}

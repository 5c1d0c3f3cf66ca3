package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Stable global row identifiers — a training-data pipeline needs dense,
  * deterministic example ids (shard manifests, curriculum order, resumable
  * exports), and none of the quick spellings survive 100 TB:
  *
  *  - `monotonically_increasing_id` encodes the partition id — values
  *    change whenever partitioning does, and they are not dense;
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
    * same cost any global ordering pays). Phase 2 is `zipWithIndex`: one
    * lightweight count job over the sorted partitions, then offsets +
    * local position fuse in a single map pass — no partition ever sees
    * more than its own slice. Because the order is total, the assigned
    * ids equal `row_number() OVER (ORDER BY key) - 1` REGARDLESS of how
    * the range bounds fell, so results are rerun-stable even under
    * different partition counts.
    */
  def globalIndex(df: DataFrame, orderCols: Seq[Column], outCol: String,
      numPartitions: Option[Int] = None): DataFrame = {
    val parts = numPartitions.getOrElse(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt)
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(StructField(outCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}

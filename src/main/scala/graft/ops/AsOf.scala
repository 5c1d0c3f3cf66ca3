package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator Spark's join set lacks, composed
  * from existing ops per the preference order (union + window, no custom
  * SparkPlan): for each left row, the LATEST right row with
  * `right.ts <= left.ts` sharing the join key.
  *
  * Plan shape: one union (no shuffle), ONE shuffle on the key for the
  * window, a single ordered pass per key with `last(_, ignoreNulls)` over
  * an unbounded-preceding frame. At 100 TB that is strictly cheaper than
  * the naive theta-join (`l.key = r.key AND r.ts <= l.ts` explodes into a
  * per-key cross product before taking the max); the union-window form is
  * linear in rows per key after the sort. Right rows order BEFORE left
  * rows at equal timestamps, giving the standard inclusive (>=) as-of
  * semantics.
  */
object AsOf {

  /** @param left      probe side (one output row per left row)
    * @param right     build side; its `payload` columns are emitted
    * @param keyCol    equi-join key
    * @param tsCol     event-time column (same name both sides)
    * @param payload   right-side columns to carry (renamed `asof_<name>`)
    * @param tieCol    total-order tiebreak within (key, ts) — required for
    *                  determinism if (key, ts) is not unique per side
    * @param joinType  "inner" drops left rows with no prior right row;
    *                  "left" keeps them with null payload
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payload: Seq[String], tieCol: String, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"bad joinType $joinType")
    val rPacked = right.select(
      col(keyCol), col(tsCol), col(tieCol).as("__tie"),
      lit(0).as("__tag"),
      struct(payload.map(col).toSeq: _*).as("__r"))
    val lTagged = left
      .withColumn("__tie", col(tieCol))
      .withColumn("__tag", lit(1))
      .withColumn("__r", lit(null).cast(rPacked.schema("__r").dataType))
    val unioned = lTagged.unionByName(rPacked, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
    val probes = filled.filter(col("__tag") === 1)
    val kept = if (joinType == "inner") probes.filter(col("__last_r").isNotNull) else probes
    payload.foldLeft(kept) { case (df, c) =>
      df.withColumn(s"asof_$c", col("__last_r").getField(c))
    }.drop("__r", "__last_r", "__tag", "__tie")
  }
}

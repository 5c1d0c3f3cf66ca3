package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — with the bucketed-equi-join
  * optimization that keeps it scalable.
  *
  * The naive plan for `point BETWEEN start AND end` is a
  * BroadcastNestedLoopJoin (every point × every interval). The standard
  * fix: quantize time into fixed buckets, explode each interval to the
  * buckets it covers, equi-join points to intervals on (key, bucket), then
  * apply the exact range predicate. The shuffle is an ordinary hash
  * exchange on (key, bucket); each point only meets intervals overlapping
  * its bucket. Bucket size trades replication (long intervals → more
  * bucket rows) against candidate precision — pick it near the median
  * interval length.
  */
object RangeJoin {

  /** Join each point row to every interval row of the same `keyCol` with
    * `startCol <= ptCol <= endCol` (all three in the same numeric unit,
    * e.g. epoch micros).
    *
    * @param bucketWidth bucket size in the same unit as the columns
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCol: String,
      ptCol: String, startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integer `div`, not double `/`: epoch-microsecond magnitudes sit close
    // enough to 2^53 that float division could flip a floor at a bucket edge
    val ivBucketed = intervals
      .withColumn("__s", col(startCol).cast("long"))
      .withColumn("__e", col(endCol).cast("long"))
      .withColumn("__bucket",
        explode(sequence(expr(s"__s div $bucketWidth"), expr(s"__e div $bucketWidth"))))
      .drop("__s", "__e")
    val ptBucketed = points
      .withColumn("__p", col(ptCol).cast("long"))
      .withColumn("__bucket", expr(s"__p div $bucketWidth"))
      .drop("__p")
    ptBucketed.join(ivBucketed, Seq(keyCol, "__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}

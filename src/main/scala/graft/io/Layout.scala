package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical data layout for scan efficiency at scale.
  *
  * The reference interchanges unsorted CSV (SURVEY.md §4.1), where every
  * query reads every byte. Parquet already gives column pruning and
  * row-group min/max statistics; LAYOUT decides whether those statistics
  * actually skip anything: a file whose key range spans the whole domain
  * skips nothing, while range-partitioned + sorted files have disjoint key
  * ranges, so a range predicate touches only the files that intersect it.
  * At 100 TB this is the difference between a full-corpus scan and reading
  * a few hundred megabytes.
  */
object Layout {

  /** Write `df` range-partitioned into ~`numFiles` files, each sorted by
    * `sortCol`: file key ranges are disjoint (up to boundary duplicates of
    * the range sampler), and row groups inside each file are locally
    * ordered, so both file-level and row-group-level min/max pruning bite
    * on `sortCol` predicates. */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.Delta

/** Release-to-release corpus diff ([[graft.ops.Delta.releaseDiff]]). */
class DeltaSpec extends SparkSpec {
  import spark.implicits._

  private val prev = Seq(
    (1L, "alpha", "web"),
    (2L, "beta", "web"),
    (3L, "gamma", "books"))
    .toDF("doc_id", "text", "source")

  private val cur = Seq(
    (1L, "alpha", "web"),      // unchanged
    (2L, "beta v2", "web"),    // changed
    (4L, "delta", "books"))    // added; 3L removed
    .toDF("doc_id", "text", "source")

  test("releaseDiff classifies all four statuses; removed rows keep prev metadata") {
    val out = Delta.releaseDiff(prev, cur, "doc_id", Seq("text"), Seq("source"))
      .as[(Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "unchanged", "web")))
    assert(out(2L) == ((2L, "changed", "web")))
    assert(out(3L) == ((3L, "removed", "books")), "removed carries last-known source")
    assert(out(4L) == ((4L, "added", "books")))
    assert(out.size == 4, "one row per key present in either snapshot")
  }

  test("fingerprint separator prevents column-boundary aliasing") {
    // payload ("ab","c") vs ("a","bc") must NOT fingerprint equal
    val p = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val c = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val out = Delta.releaseDiff(p, c, "k", Seq("x", "y"))
      .as[(Long, String)].collect()
    assert(out.head._2 == "changed")
  }

  test("null payload columns fingerprint as empty, not as a dropped column") {
    val p = Seq((1L, Option.empty[String], Option("z"))).toDF("k", "x", "y")
    val c = Seq((1L, Option(""), Option("z"))).toDF("k", "x", "y")
    val out = Delta.releaseDiff(p, c, "k", Seq("x", "y"))
      .as[(Long, String)].collect()
    // null and "" normalize to the same fingerprint by the documented
    // convention — the diff is about CONTENT, and a crawler that starts
    // emitting "" for absent fields must not mark the whole corpus changed
    assert(out.head._2 == "unchanged")
  }

  test("plan: one full-outer equi-join over scan-computed fingerprints, bodies never shuffled") {
    // parquet-backed so the fingerprint projection survives as a plan node
    // (LocalTableScan would constant-fold it away)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Delta.releaseDiff(
      docs.filter($"doc_id" % 2 === 0), docs, "doc_id", Seq("text"), Seq("source"))
    out.collect()
    val p = out.queryExecution.executedPlan.toString()
    assert(p.contains("FullOuter"), p)
    // tree prints top-down: a child line appears AFTER its parent, so the
    // md5 projection appearing after the first Exchange line means the
    // fingerprint is computed map-side, below the shuffle
    val lines = p.linesIterator.toSeq
    val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
    val md5Idx = lines.indexWhere(_.contains("md5"))
    assert(exchangeIdx >= 0 && md5Idx > exchangeIdx,
      s"md5 fingerprint should be computed map-side (below the first exchange):\n$p")
    // the shuffled projections are slim: the text column is consumed by the
    // map-side md5 / scan nodes and appears nowhere else (in particular not
    // in the join output or the final projection)
    assert(lines.filter(_.contains("text#")).forall(l =>
        l.contains("md5(") || l.contains("FileScan") || l.contains("ColumnarToRow")),
      s"document bodies must not survive past the fingerprint projection:\n$p")
  }
}

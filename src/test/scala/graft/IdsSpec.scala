package graft

import org.apache.spark.sql.functions._

import graft.ops.Ids

/** Global-id assignment semantics: dense, 0-based, total-order-correct,
  * and invariant to partition count (the property monotonically_increasing_id
  * lacks and the no-partition window can't deliver at scale). */
class IdsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    ("b", 10L), ("a", 5L), ("a", 3L), ("c", 1L), ("b", 2L), ("a", 9L))
    .toDF("lang", "doc_id")

  test("globalIndex equals row_number over the total order, 0-based and dense") {
    val got = Ids.globalIndex(docs, Seq($"lang", $"doc_id"), "idx")
      .orderBy($"idx").select($"lang", $"doc_id", $"idx")
      .as[(String, Long, Long)].collect().toSeq
    val want = docs.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(identity).zipWithIndex.map { case ((l, d), i) => (l, d, i.toLong) }.toSeq
    assert(got == want)
  }

  test("globalIndex is invariant to the partition count") {
    def ids(parts: Int) =
      Ids.globalIndex(docs, Seq($"lang", $"doc_id"), "idx", Some(parts))
        .select($"doc_id", $"idx").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(ids(1) == ids(3) && ids(3) == ids(7))
  }

  test("globalIndex matches row_number at volume across partition counts (incl. empty ones)") {
    val big = spark.range(0, 5000).select(($"id" * 2654435761L % 9973).as("k"), $"id")
    def ids(parts: Int) =
      Ids.globalIndex(big, Seq($"k", $"id"), "idx", Some(parts))
        .select($"id", $"idx").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want = big.select($"k", $"id").as[(Long, Long)].collect()
      .sortBy(identity).zipWithIndex.map { case ((_, id), i) => (id, i.toLong) }
      .sortBy(_._1).toSeq
    // 64 leaves some range partitions empty on 5000 keys; offsets must skip them
    assert(ids(4) == want && ids(64) == want)
  }

  test("globalRankCumsum equals row_number + running sum over the total order") {
    val vals = Seq(("a", 5L), ("b", 12L), ("c", 5L), ("d", 40L), ("e", 1L),
      ("f", 12L)).toDF("k", "v")
    val (got, tot, nr) = Ids.globalRankCumsum(vals,
      Seq($"v".desc, $"k".asc), "v", "rank", "cum", Some(3))
    assert(tot == 75L && nr == 6L)
    val rows = got.select($"k", $"rank", $"cum")
      .as[(String, Long, Long)].collect().sortBy(_._2).toSeq
    // order: d(40) b(12) f(12) a(5) c(5) e(1); cum: 40 52 64 69 74 75
    assert(rows == Seq(("d", 1L, 40L), ("b", 2L, 52L), ("f", 3L, 64L),
      ("a", 4L, 69L), ("c", 5L, 74L), ("e", 6L, 75L)))
  }

  test("globalRankCumsum is invariant to the partition count (incl. empty ones)") {
    val big = spark.range(0, 5000)
      .select(($"id" * 2654435761L % 9973).as("k"), ($"id" % 97).as("v"))
    def run(parts: Int) = {
      val (df, tot, _) = Ids.globalRankCumsum(big, Seq($"k".asc, $"v".asc),
        "v", "rank", "cum", Some(parts))
      (df.select($"rank", $"cum").as[(Long, Long)].collect().sortBy(_._1).toSeq,
        tot)
    }
    val (r4, t4) = run(4)
    val (r64, t64) = run(64)
    assert(t4 == t64 && r4 == r64)
    // spot-check against the single-task window truth
    val want = big.select($"k", $"v").as[(Long, Long)].collect()
      .sortBy(identity).map(_._2)
      .scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (c, i) => (i + 1L, c) }.toSeq
    assert(r4 == want)
  }

  test("globalRankCumsum plans no single-partition exchange") {
    val big = spark.range(0, 2000)
      .select(($"id" % 37).as("k"), ($"id" % 11).as("v"), $"id")
    val (df, _, _) = Ids.globalRankCumsum(big, Seq($"k".asc, $"v".asc, $"id".asc),
      "v", "rank", "cum", Some(8))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("globalRankCumsum fails loudly when one partition's partial sum crosses 2^63") {
    // Some(1): every row lands in the single range partition, so the scan
    // job's Math.addExact is the line that must raise — not a wrapped rank
    val vals = Seq(("a", Long.MaxValue), ("b", Long.MaxValue), ("c", 1L))
      .toDF("k", "v")
    val e = intercept[Exception] {
      Ids.globalRankCumsum(vals, Seq($"k".asc), "v", "rank", "cum", Some(1))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("overflowed int64")), e.toString)
  }

  test("globalRankCumsum fails loudly when the cross-partition prefix sum crosses 2^63") {
    // 200 rows of 2^56: every per-partition sum fits comfortably, the
    // DRIVER prefix scan is what wraps — the second addExact site
    val big = spark.range(0, 200).select($"id".as("k"), lit(1L << 56).as("v"))
    val e = intercept[ArithmeticException] {
      Ids.globalRankCumsum(big, Seq($"k".asc), "v", "rank", "cum", Some(8))
    }
    assert(e.getMessage.contains("overflowed int64"), e.getMessage)
  }

  test("globalRankCumsum refuses a non-ANSI session up front") {
    // phases 1-2 are Math.addExact regardless of conf, but phase 3's
    // window sum is only overflow-loud under ANSI - a non-ANSI session
    // must be rejected, not served an inconsistent overflow posture
    val vals = Seq(("a", 1L)).toDF("k", "v")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e = intercept[IllegalArgumentException] {
        Ids.globalRankCumsum(vals, Seq($"k".asc), "v", "rank", "cum", Some(1))
      }
      assert(e.getMessage.contains("spark.sql.ansi.enabled"), e.getMessage)
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("surrogateKey: dense 0-based surrogates in key order, stable, null-dropping") {
    val df = Seq("b", "a", "c", "a", null, "b").map(Tuple1(_)).toDF("k")
    val out = Ids.surrogateKey(df, "k", "sid")
      .select($"k", $"sid").as[(String, Long)].collect().toSeq
    // dense over DISTINCT keys in total key order: a->0, b->1, c->2;
    // duplicates share the surrogate; the null key row is dropped
    assert(out.sorted == Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L),
      ("c", 2L)))
    // rerun-stable under a different partition count
    val out2 = Ids.surrogateKey(df.repartition(7), "k", "sid")
      .select($"k", $"sid").as[(String, Long)].collect().toSeq
    assert(out2.sorted == out.sorted)
  }

  test("surrogateKey feeds groundedness: integral dtype, -1-sentinel-safe") {
    val ctx = Seq(("doc-1", "t"), ("doc-2", "u")).toDF("key", "text")
    val sid = Ids.surrogateKey(ctx, "key", "doc_sid")
    assert(sid.schema("doc_sid").dataType ==
      org.apache.spark.sql.types.LongType)
    // 0-based surrogates never collide with the -1 no-support sentinel
    val vals = sid.select($"doc_sid").as[Long].collect()
    assert(vals.forall(_ >= 0L) && vals.toSet == Set(0L, 1L))
  }

  test("globalIndex assigns ids as a codegen'd projection over Tungsten rows") {
    val out = Ids.globalIndex(docs, Seq($"lang", $"doc_id"), "idx", Some(3))
    val plan = out.queryExecution.executedPlan.toString
    // offset(pid) + low-33-bits-of-mono-id, computed as a projection inside
    // WholeStageCodegen — not an external-Row zipWithIndex round-trip
    assert(plan.contains("monotonically_increasing_id"), plan)
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"id projection not in WholeStageCodegen:\n$plan")
    // and the generated code actually compiles with the id arithmetic in it
    val sources = org.apache.spark.sql.graftbridge.Bridge.compileWholeStageCodegen(out)
    assert(sources.nonEmpty)
  }
}

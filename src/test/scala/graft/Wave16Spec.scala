package graft

import graft.ops.Bitext

/** Wave 16: bitext cleaning audit rules. */
class Wave16Spec extends SparkSpec {
  import spark.implicits._

  test("cleanAudit: length-ratio bounds and identical-text rejection") {
    import org.apache.spark.sql.functions._
    val pairs = Seq(
      (1L, 11L, 1100000L), // normal pair
      (2L, 12L, 1100000L), // src 5x longer than tgt -> len filtered
      (3L, 13L, 1100000L)) // identical normalized text -> dup filtered
      .toDF("src_id", "tgt_id", "margin_ppm")
    val src = Seq(
      (1L, "bonjour le monde"),
      (2L, "a very very very long source sentence here"),
      (3L, "Same   Text")).toDF("id", "text")
    val tgt = Seq(
      (11L, "hello world line"),
      (12L, "short"),
      (13L, "same text")).toDF("id", "text")
    val out = Bitext.cleanAudit(pairs, src, "id", tgt, "id", "text",
        minLenPpm = 600000L, maxLenPpm = 1666667L)
      .select("src_id", "len_ratio_ppm", "len_ok", "dup_ok", "keep")
      .as[(Long, Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1000000L, true, true, true)))
    assert(!out(2L)._3 && out(2L)._4 && !out(2L)._5)
    // "Same   Text" normalizes to "same text" -> dup
    assert(out(3L)._3 && !out(3L)._4 && !out(3L)._5)
  }
}

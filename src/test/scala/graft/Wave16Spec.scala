package graft

import org.apache.spark.sql.functions.col

import graft.ops.{Bitext, RankEval, Sft}

/** Wave 16: bitext cleaning, sign-test gating, paged block reuse. */
class Wave16Spec extends SparkSpec {
  import spark.implicits._

  test("signTestTable: exact binomial anchors and symmetry") {
    val t = RankEval.signTestTable(16)
      .map { case (n, w, p) => (n, w) -> p }.toMap
    // n=1: either outcome is p=1 (2 * P(X<=0) = 1)
    assert(t((1L, 0L)) == 1000000L && t((1L, 1L)) == 1000000L)
    // n=16, w=16: 2 * (1/2^16) = 30.5 ppm -> rounds to 31
    assert(t((16L, 16L)) == 31L)
    // balanced outcome can never be significant
    assert(t((16L, 8L)) == 1000000L)
    // two-sided symmetry
    for (w <- 0 to 16) assert(t((16L, w.toLong)) == t((16L, (16 - w).toLong)))
    // monotone: more extreme wins -> smaller p
    for (w <- 8 until 16)
      assert(t((16L, (w + 1).toLong)) <= t((16L, w.toLong)))
  }

  test("signTest: gate fires only on extreme win counts") {
    // pair 1: A wins 15/16 -> p = 2*(C(16,0)+C(16,1))/2^16 = 519 ppm
    // pair 2: 9/16 -> not significant; pair 3: 20 comparisons -> dropped
    val m = (Seq.fill(15)((1L, true)) :+ ((1L, false))) ++
      Seq.tabulate(16)(i => (2L, i < 9)) ++
      Seq.fill(20)((3L, true))
    val out = RankEval.signTest(m.toDF("pair", "aw"), "pair", col("aw"),
        maxN = 16, alphaPpm = 50000L)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1L, 16L, 15L, 519L, true)))
    assert(out(2L)._4 > 50000L && !out(2L)._5)
  }

  test("pagedBlockReuse: shared prefixes share block keys") {
    // 16-char blocks; prompts share exactly the first 32 chars (2 blocks)
    val pre = "0123456789abcdef" * 2
    val prompts = Seq(
      ("r", pre + "XXXXXXXXXXXXXXXX"),
      ("r", pre + "YYYYYYYYYYYYYYYY"),
      ("s", "short")).toDF("route", "prompt")
    val out = Sft.pagedBlockReuse(prompts, "route", "prompt", 16)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // route r: 3 blocks per prompt, 6 total; distinct = 2 shared + 2
    // divergent tails = 4; saved = 2
    assert(out("r") == (("r", 6L, 4L, 2L, 2L * 1000000L / 6L)))
    // sub-block prompt: nothing cacheable
    assert(out("s") == (("s", 0L, 0L, 0L, 0L)))
  }

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

package graft

import org.apache.spark.sql.functions.col

import graft.ops.{Dedup, RankEval, Sft}

/** Wave 17: self-consistency voting, ECE calibration, Fleiss' kappa,
  * speculative-decoding acceptance, edit-distance confirmation. */
class Wave17Spec extends SparkSpec {
  import spark.implicits._

  test("integral div truncates toward zero (the signed-kappa contract)") {
    // DuckDB's // does the same (verified: -7 // 2 = -3), so kappa_ppm
    // may go negative without an engine-divergence risk
    assert(spark.sql("SELECT -7 div 2").first.getLong(0) == -3L)
  }

  test("selfConsistency: modal answer with deterministic tie-break") {
    val s = (Seq((1L, 7L), (1L, 7L), (1L, 3L), (1L, 3L), (1L, 5L))
      .map { case (t, a) => (t, a, 7L) } ++
      Seq((2L, 4L, 4L), (2L, 4L, 4L), (2L, 4L, 4L)))
      .toDF("task", "answer", "gold")
    val out = RankEval.selfConsistency(s, "task", "answer", "gold")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // task 1: 7 and 3 tie at 2 votes -> smallest answer (3) wins the
    // tie, which disagrees with gold 7; 2/5 samples match gold
    assert(out(1L) == ((1L, 5L, 3L, 3L, 2L, 400000L, 400000L, 7L, false)))
    // task 2: unanimous
    assert(out(2L) == ((2L, 3L, 1L, 4L, 3L, 1000000L, 1000000L, 4L, true)))
  }

  test("calibrationBins: per-bin gaps, top-bin fold, weighted ECE") {
    val preds = Seq((950000L, true), (950000L, false), (1000000L, true),
      (50000L, false)).toDF("conf_ppm", "ok")
    val out = RankEval.calibrationBins(preds, "conf_ppm", col("ok"), 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // conf = 1e6 folds into bin 9; ece = (3*300000 + 50000) div 4
    assert(out(9L) == ((9L, 3L, 966666L, 666666L, 300000L, 237500L)))
    assert(out(0L) == ((0L, 1L, 50000L, 0L, 50000L, 237500L)))
  }

  test("fleissKappa: worked example, negative and degenerate cases") {
    val ratings =
      // group a: item 1 unanimous (0,0,0); item 2 split (0,1,1)
      Seq(("a", 1L, 0L), ("a", 1L, 0L), ("a", 1L, 0L),
        ("a", 2L, 0L), ("a", 2L, 1L), ("a", 2L, 1L),
        // group b: one item, two raters disagreeing -> kappa = -1
        ("b", 1L, 0L), ("b", 1L, 1L),
        // group c: one item, one category everywhere -> P_e = 1e6
        ("c", 1L, 2L), ("c", 1L, 2L))
        .toDF("g", "item", "label")
    val out = RankEval.fleissKappa(ratings, "g", "item", "label")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // a: P_o = (1e6 + 333333) div 2; p = (4/6, 2/6) -> P_e = 555553;
    // kappa = 111113e6 div 444447 = 250002
    assert(out("a") == (("a", 2L, 6L, 666666L, 555553L, 250002L)))
    assert(out("b") == (("b", 1L, 2L, 0L, 500000L, -1000000L)))
    assert(out("c") == (("c", 1L, 2L, 1000000L, 1000000L, 1000000L)))
  }

  test("speculativeAcceptance: block prefixes, ragged input mismatches") {
    val seqs = Seq(
      (1L, Seq("a", "x", "c", "d", "y"), Seq("a", "b", "c", "d", "e")),
      (2L, Seq("a"), Seq("a", "b")))
      .toDF("id", "draft", "target")
    val out = Sft.speculativeAcceptance(seqs, "id", "draft", "target", 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: matches TFTTF; blocks (2, prefix 1) (2, prefix 2) (1, prefix 0)
    assert(out(1L) == ((1L, 5L, 3L, 600000L, 3L, 3L, 6L, 1000000L, 2000000L)))
    // doc 2: zip_with pads the short draft with null -> mismatch, not poison
    assert(out(2L) == ((2L, 2L, 1L, 500000L, 1L, 1L, 2L, 1000000L, 2000000L)))
  }

  test("editConfirmPairs: levenshtein verdicts, ASCII strip, empty pair") {
    val texts = Seq((1L, "kitten"), (2L, "sitting"), (3L, "héllo"),
      (4L, "hello"), (5L, ""), (6L, "  ")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.editConfirmPairs(pairs, "id_a", "id_b",
        texts, "id", "text", minSimPpm = 600000L)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // kitten/sitting: dist 3 over max len 7
    assert(out((1L, 2L)) == ((1L, 2L, 3L, 1000000L - 3000000L / 7L, false)))
    // the accented char strips out: "hllo" vs "hello" -> dist 1
    assert(out((3L, 4L)) == ((3L, 4L, 1L, 800000L, true)))
    // both normalize to empty -> identical by convention
    assert(out((5L, 6L)) == ((5L, 6L, 0L, 1000000L, true)))
  }
}

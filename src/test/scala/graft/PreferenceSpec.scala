package graft

import org.apache.spark.sql.functions._

import graft.ops.Preference

/** Preference-pair construction semantics (the DPO data-prep step):
  * mirrored best-vs-worst pairing, margin gate, per-prompt cap. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cand = Seq(
    // prompt "p": rewards 50, 40, 30, 20, 10 → mirror pairs
    // (1,5)=40, (2,4)=20, middle 3 self-pairs (dropped)
    ("p", 1L, 50L), ("p", 2L, 40L), ("p", 3L, 30L),
    ("p", 4L, 20L), ("p", 5L, 10L),
    // prompt "q": two candidates, margin 5
    ("q", 6L, 25L), ("q", 7L, 20L),
    // prompt "r": singleton → no pair
    ("r", 8L, 99L))
    .toDF("prompt", "id", "score")

  test("mirrored pairing: r-th best pairs with r-th worst; middle drops") {
    val out = Preference.pairsFromRanked(cand, "prompt", "id", "score",
        minMargin = 1L, maxPairs = 10)
      .select($"prompt", $"chosen_id", $"rejected_id", $"margin_e6")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      ("p", 1L, 5L, 40L), ("p", 2L, 4L, 20L), ("q", 6L, 7L, 5L)))
  }

  test("margin gate drops near-ties; cap bounds pairs per prompt") {
    val out = Preference.pairsFromRanked(cand, "prompt", "id", "score",
        minMargin = 21L, maxPairs = 10)
      .select($"chosen_id").as[Long].collect().toSeq
    assert(out == Seq(1L)) // only the 40-margin pair survives
    val capped = Preference.pairsFromRanked(cand, "prompt", "id", "score",
        minMargin = 1L, maxPairs = 1)
      .select($"chosen_id").as[Long].collect().sorted.toSeq
    assert(capped == Seq(1L, 6L)) // one pair per prompt
  }

  test("reward ties never emit a pair (margin 0 < minMargin)") {
    val tied = Seq(("t", 1L, 10L), ("t", 2L, 10L), ("t", 3L, 10L), ("t", 4L, 10L))
      .toDF("prompt", "id", "score")
    assert(Preference.pairsFromRanked(tied, "prompt", "id", "score", 1L, 10).count() == 0L)
  }

  test("chosen/rejected are disjoint within a pair and margins are positive") {
    val out = Preference.pairsFromRanked(cand, "prompt", "id", "score", 1L, 10)
      .select($"chosen_id", $"rejected_id", $"margin_e6").collect()
    assert(out.forall(r => r.getLong(0) != r.getLong(1) && r.getLong(2) >= 1L))
  }
}

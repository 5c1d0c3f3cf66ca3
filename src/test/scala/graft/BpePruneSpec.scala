package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** BPE vocabulary-pruning semantics: per-merge usage counting and the
  * usage-seeded producer-closure prune. */
class BpePruneSpec extends SparkSpec {
  import spark.implicits._

  test("mergeUsage: counts weighted applications per round") {
    // corpus: "aa aa ab" → words aa(×2), ab(×1)
    val df = Seq("aa aa ab").toDF("text")
    val merges = Seq(("a", "a"), ("aa", "</w>"))
    val u = Bpe.mergeUsage(df, "text", merges)
      .orderBy("merge_round")
      .as[(Long, Long)].collect().toSeq
    // round 1 (a,a): fires once in "a a </w>" (weight 2), zero in "a b </w>"
    // round 2 (aa,</w>): fires once per "aa </w>" (weight 2)
    assert(u == Seq((1L, 2L), (2L, 2L)))
  }

  test("mergeUsage: unexercised merge counts zero") {
    val df = Seq("xy").toDF("text")
    val u = Bpe.mergeUsage(df, "text", Seq(("q", "z"), ("x", "y")))
      .orderBy("merge_round").as[(Long, Long)].collect().toSeq
    assert(u == Seq((1L, 0L), (2L, 1L)))
  }

  private def mergeTable(rows: (Long, String, String)*) =
    rows.toSeq.map { case (k, l, r) => (k, l, r, 0L) }
      .toDF("merge_round", "left_sym", "right_sym", "pair_cnt")

  test("pruneByUsage: seeds are the top-keep by usage, ties to earliest round") {
    val m = mergeTable((1L, "a", "b"), (2L, "c", "d"), (3L, "e", "f"))
    val u = Seq((1L, 5L), (2L, 9L), (3L, 5L)).toDF("merge_round", "n_applied")
    val kept = Bpe.pruneByUsage(m, u, keep = 2)
      .filter($"kept").select($"merge_round").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L)) // tie 5 vs 5 → round 1 beats round 3
  }

  test("pruneByUsage: producer closure pulls in dependencies of kept merges") {
    // merge 2's left input "ab" is produced by merge 1; keeping only the
    // most-used merge (2) must also keep merge 1
    val m = mergeTable((1L, "a", "b"), (2L, "ab", "c"), (3L, "x", "y"))
    val u = Seq((1L, 1L), (2L, 99L), (3L, 50L)).toDF("merge_round", "n_applied")
    val kept = Bpe.pruneByUsage(m, u, keep = 1)
      .filter($"kept").select($"merge_round").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("pruneByUsage: closure is transitive (chain of producers)") {
    val m = mergeTable((1L, "a", "b"), (2L, "ab", "c"), (3L, "abc", "d"))
    val u = Seq((1L, 0L), (2L, 0L), (3L, 7L)).toDF("merge_round", "n_applied")
    val kept = Bpe.pruneByUsage(m, u, keep = 1)
      .filter($"kept").select($"merge_round").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L))
  }

  test("pruned-subset encoding is never shorter than the full encoding") {
    val docs = Seq.tabulate(40)(i => (i.toLong, s"the quick brown fox $i jumps the the")).toDF("doc_id", "text")
    val (mergesDf, _) = Bpe.learn(docs, "text", 6)
    val ms = Bpe.mergeSeq(mergesDf)
    val hv = Seq("the", "quick", "thequick", "zzz").toDF("w")
    val full = Bpe.segmentWords(hv, "w", ms)
      .select($"w", size(split($"sym", " ")).as("nf"))
    val sub = Bpe.segmentWords(hv, "w", ms.take(2))
      .select($"w", size(split($"sym", " ")).as("np"))
    val joined = full.join(sub, Seq("w")).collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getInt(2) >= r.getInt(1)))
  }
}

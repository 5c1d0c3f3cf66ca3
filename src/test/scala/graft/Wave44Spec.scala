package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Wave 44: tf-weighted (multiset) Jaccard near-dup verification. */
class Wave44Spec extends SparkSpec {
  import spark.implicits._

  test("weighted vs set Jaccard: repetition mass is visible") {
    // docs 1/2 have IDENTICAL bigram-shingle SETS ({spam spam, spam
    // eggs}) - identical signatures, guaranteed candidates, and
    // jaccard_set = 1.0 - but different repetition mass; doc 3 is an
    // exact copy of 1. Set-Jaccard calls all three pairs identical; the
    // weighted verify separates them.
    val docs = Seq(
      (1L, "spam spam spam spam spam eggs"),
      (2L, "spam spam spam eggs"),
      (3L, "spam spam spam spam spam eggs"))
      .toDF("doc_id", "text")
    val out = Dedup.weightedJaccardPairs(docs, "doc_id", "text", 12, 4, 0L)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // exact copy: both metrics saturate
    val c = out((1L, 3L))
    assert(c._3 == 1.0 && c._4 == 6L && c._5 == 1000000L)
    // same shingle SET, different tf: set says 1.0, weighted says
    // inter = min(5,3)+min(1,1) = 4, union = 6+4-4 = 6 -> 666666 ppm
    for (p <- Seq((1L, 2L), (2L, 3L))) {
      val r = out(p)
      assert(r._3 == 1.0 && r._4 == 4L && r._5 == 666666L, r.toString)
    }
  }

  test("weightedJaccardPairs ≡ driver brute force over the candidate set") {
    val rnd = new scala.util.Random(47)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 30L).map { i =>
      i -> (1 to 5 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.weightedJaccardPairs(df, "doc_id", "text", 12, 4, 0L)
      .as[(Long, Long, Double, Long, Long)].collect()
    val tf = docs.toMap.view.mapValues(
      _.split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap).toMap
    for ((a, b, _, inter, ppm) <- got) {
      val (ta, tb) = (tf(a), tf(b))
      val expInter = (ta.keySet & tb.keySet).toSeq
        .map(t => math.min(ta(t), tb(t))).sum
      val union = ta.values.sum + tb.values.sum - expInter
      assert(inter == expInter, s"($a,$b)")
      assert(ppm == (if (union <= 0) 0L else expInter * 1000000L / union),
        s"($a,$b)")
    }
    assert(got.nonEmpty)
  }
}

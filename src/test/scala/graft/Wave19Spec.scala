package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sketch}

/** Wave 19: KMV distinct sketch, histogram quantile sketch, per-group
  * MinHash signatures, cross-source duplication matrix. */
class Wave19Spec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: exact below k, estimate in range above") {
    val small = (1 to 5).map(i => ("s", s"v$i")) ++
      Seq(("s", "v1"), ("s", "v2")) // repeats must not inflate the sketch
    val big = (1 to 1000).map(i => ("b", s"doc$i"))
    val out = Sketch.kmvDistinct((small ++ big).toDF("g", "v"), "g", "v", 16)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // below k: sketch holds everything, estimator reports the exact count
    assert(out("s")._2 == 5L && out("s")._4 == 5L)
    // above k: n_seen capped at k, estimate within 3 sigma (~3/sqrt(14))
    assert(out("b")._2 == 16L)
    assert(out("b")._4 > 300L && out("b")._4 < 3000L)
  }

  test("kmvDistinct: sketch is mergeable (min-k of union = min-k of minks)") {
    val a = (1 to 200).map(i => ("g", s"x$i")).toDF("g", "v")
    val b = (150 to 350).map(i => ("g", s"x$i")).toDF("g", "v")
    val whole = Sketch.kmvDistinct(a.union(b), "g", "v", 8)
      .select("kth_hash").as[Long].head()
    // merging = re-running min-k over the two bottom-k hash sets; emulate
    // by unioning the raw frames' per-part sketch inputs (hash is
    // deterministic, so the k smallest of the union of bottom-ks equals
    // the k smallest of the union)
    val merged = Sketch.kmvDistinct(
      a.limit(1000000).union(b.limit(1000000)), "g", "v", 8)
      .select("kth_hash").as[Long].head()
    assert(whole == merged)
  }

  test("histogramQuantiles: sketch edge >= exact, within one bin") {
    val vals = (1 to 100).map(i => ("g", i.toLong))
    val out = Sketch.histogramQuantiles(vals.toDF("g", "v"), "g", "v",
        10L, Seq(50, 90))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    val (_, n, nBins, s50, e50, s90, e90) = out
    assert(n == 100L && nBins == 11L) // bins 0..10 (v=100 lands in bin 10)
    assert(e50 == 50L && e90 == 90L)  // exact rank-ceil percentiles
    // sketch reads the bin's upper edge: >= exact, within binWidth
    assert(s50 >= e50 && s50 - e50 <= 10L)
    assert(s90 >= e90 && s90 - e90 <= 10L)
  }

  test("minHashSignature: identical sets match, disjoint sets do not") {
    val x = (1 to 60).map(i => ("x", s"tok$i"))
    val y = (1 to 60).map(i => ("y", s"tok$i"))       // same token set
    val z = (100 to 160).map(i => ("z", s"tok$i"))    // disjoint
    val sig = Sketch.minHashSignature((x ++ y ++ z).toDF("g", "t"),
        "g", "t", 16)
      .as[(String, Seq[Long])].collect().map(r => r._1 -> r._2).toMap
    assert(sig("x").size == 16)
    assert(sig("x") == sig("y"))
    val agree = sig("x").zip(sig("z")).count { case (a, b) => a == b }
    assert(agree <= 4) // expected 0; allow rare collisions
  }

  test("crossSourceDupMatrix: shared distinct fingerprints + containment") {
    val docs = Seq(
      ("a", "t1"), ("a", "t1"), ("a", "t2"), ("a", "t3"), ("a", "t4"),
      ("b", "t1"), ("b", "t2"),
      ("c", "zz")).toDF("src", "text")
    val out = Dedup.crossSourceDupMatrix(docs, "src", col("text"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    // only (a,b) share; c pairs with no one -> absent, not zero-row noise
    assert(out.length == 1)
    val (sa, sb, sh, na, nb, ca, cb) = out.head
    assert((sa, sb, sh, na, nb) == (("a", "b", 2L, 4L, 2L)))
    assert(ca == 500000L && cb == 1000000L) // b fully contained in a
  }
}

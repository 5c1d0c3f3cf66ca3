package graft

import org.apache.spark.sql.functions._

import graft.ops.{Audit, Dedup, Preference, Vocab}

/** Wave 31: template floods, provenance manifests, position bias,
  * nucleus vocabulary, vector-store audit. */
class Wave31Spec extends SparkSpec {
  import spark.implicits._

  test("templateFloodReport: digit runs fold, flood share counted") {
    // s1: "order 4512 shipped" / "Order   7 shipped" / "order 9 shipped"
    // share one skeleton (cluster 3, >= min 3); one singleton
    val docs = Seq(
      ("s1", "order 4512 shipped"), ("s1", "Order   7 shipped"),
      ("s1", "order 9 shipped"), ("s1", "hello world"),
      ("s2", "a 1 b"), ("s2", "a 2 b"))
      .toDF("source", "text")
    val out = Dedup.templateFloodReport(docs, "source", "text", 3L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("s1") == (("s1", 4L, 2L, 3L, 750000L)))
    // s2's cluster of 2 is below the floor -> 0 flood
    assert(out("s2") == (("s2", 2L, 1L, 2L, 0L)))
  }

  test("provenanceManifest: union of sources, singletons dropped") {
    val docs = Seq(
      (1L, "a", "same  text"), (5L, "b", "same text"), (3L, "a", "same text "),
      (9L, "c", "unique"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.provenanceManifest(docs, "doc_id", "source",
        graft.functions.HashFns.md5Hex(Dedup.normalized(col("text"))))
      .as[(String, Long, Long, Long, String, Long)].collect()
    assert(out.length == 1)
    val r = out.head
    assert(r._2 == 1L && r._3 == 3L && r._4 == 2L)
    assert(r._5 == "a,b" && r._6 == 1L)
  }

  test("positionBias: per-bucket win shares and bias") {
    val m = Seq(
      (50000L, true), (50000L, false),          // bucket 0: 1/2
      (150000L, true), (150000L, true),          // bucket 1: 2/2
      (250000L, false))                          // bucket 2: 0/1
      .toDF("margin_e6", "fw")
    val out = Preference.positionBias(m, "fw", "margin_e6", 100000L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 2L, 1L, 500000L, 0L)))
    assert(out(1L) == ((1L, 2L, 2L, 1000000L, 500000L)))
    assert(out(2L) == ((2L, 1L, 0L, 0L, -500000L)))
  }

  test("nucleusVocab: frequency-ordered inclusion until target mass") {
    // g: a x6, b x3, c x1 -> total 10. 90% mass: a (cum-before 0),
    // b (cum-before 6 < 9), c (cum-before 9 NOT < 9) -> nucleus 2
    val docs = Seq(("g", "a a a a a a b b b c")).toDF("src", "text")
    val out = Vocab.nucleusVocab(docs, "src", "text", 900000L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.head == (("g", 10L, 3L, 2L, 1000000L)))
  }

  test("nucleusVocab: count ties broken by token") {
    // all counts 1; order a,b,c,d; 50% mass -> a (0<2), b (1<2), c (2 not<2)
    val docs = Seq(("g", "d c b a")).toDF("src", "text")
    val out = Vocab.nucleusVocab(docs, "src", "text", 500000L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.head._4 == 2L)
  }

  test("vectorStoreAudit: orphans, dim anomaly, non-finite flagged") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, Float.NaN)),
      (5L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val out = Audit.vectorStoreAudit(docs, "doc_id", vecs, "vec_id",
        "embedding")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(out == ((3L, 3L, 2L, 1L, 1L, 2L, 1L, 1L)))
  }
}

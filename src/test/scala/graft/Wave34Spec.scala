package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Skew}

/** Wave 34: dedup ROI table, join amplification. */
class Wave34Spec extends SparkSpec {
  import spark.implicits._

  test("dedupRoi: keeper spared, docs and tokens accounted") {
    // fp by first token: cluster "a ..." = docs 1,2,3 (keeper 1);
    // "b" singleton
    val docs = Seq(
      (1L, "a one two"), (2L, "a three"), (3L, "a four five six"),
      (4L, "b solo"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupRoi(docs, "doc_id", "text", "t",
        substring(col("text"), 1, 1))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // tokens: 3+2+4+2 = 11; removed docs 2,3 -> 2+4 = 6 tokens
    assert(out == (("t", 4L, 11L, 2L, 6L, 500000L, 545454L)))
  }

  test("dedupRoi: no duplicates -> zero removal") {
    val docs = Seq((1L, "x y"), (2L, "z w")).toDF("doc_id", "text")
    val out = Dedup.dedupRoi(docs, "doc_id", "text", "t",
        graft.functions.HashFns.md5Hex(Dedup.normalized(col("text"))))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(out._4 == 0L && out._5 == 0L && out._6 == 0L && out._7 == 0L)
  }

  test("joinAmplification: products, shares, top-k order") {
    val l = Seq((1L, "x"), (1L, "x"), (1L, "x"), (2L, "x"), (3L, "x"))
      .toDF("k", "pad")
    val r = Seq((1L, "y"), (1L, "y"), (2L, "y"), (9L, "y"))
      .toDF("k", "pad")
    val out = Skew.joinAmplification(l, r, "k", "k", topK = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    // key 1: 3*2=6 of total 7; key 2: 1*1=1; key 3/9 unmatched -> absent
    assert(out.length == 2)
    assert(out(0) == ((1L, 3L, 2L, 6L, 857142L)))
    assert(out(1) == ((2L, 1L, 1L, 1L, 142857L)))
  }
}

package graft

import graft.ops.Rag

/** Wave 39: RAG groundedness audit + citation attribution. */
class Wave39Spec extends SparkSpec {
  import spark.implicits._

  private val ctx = Seq(
    (1L, 10L, "alpha beta gamma delta epsilon zeta"),
    (1L, 20L, "one two three four five"),
    (2L, 10L, "alpha beta gamma delta"),
    (3L, 30L, "alpha beta gamma delta epsilon"),
    (3L, 31L, "beta gamma delta epsilon zeta"))
    .toDF("q_id", "doc_id", "text")

  test("groundednessAudit: supported/unsupported split, citation, edges") {
    val answers = Seq(
      (1L, "alpha beta gamma delta nine ten eleven twelve"), // 5 spans, 1 sup
      (2L, "alpha beta gamma delta"),                        // fully grounded
      (4L, "too short"))                                     // < n tokens
      .toDF("q_id", "answer")
    val out = Rag.groundednessAudit(answers, "q_id", "answer",
        ctx, "doc_id", "text", n = 4)
      .orderBy("q_id").as[(Long, Long, Long, Long, Long, Long)].collect()
    // q1: spans of an 8-token answer = 5 distinct; only 'alpha beta gamma
    // delta' appears in context (doc 10)
    assert(out(0) == ((1L, 5L, 1L, 4L * 1000000L / 5L, 10L, 1000000L)))
    // q2: single span, fully supported
    assert(out(1) == ((2L, 1L, 1L, 0L, 10L, 1000000L)))
    // q4: no spans -> zeroed row, noise citation
    assert(out(2) == ((4L, 0L, 0L, 0L, -1L, 0L)))
  }

  test("attributionTable: redundant support visible, zero-hit docs kept") {
    val answers = Seq((3L, "beta gamma delta epsilon")).toDF("q_id", "answer")
    val out = Rag.attributionTable(answers, "q_id", "answer",
        ctx, "doc_id", "text", n = 4)
      .orderBy("q_id", "doc_id").as[(Long, Long, Long, Long)].collect()
    // the full retrieved set is always rendered: queries without an
    // answer row keep their context docs at zero hits
    assert(out.length == 5 &&
      out.filter(_._1 != 3L).forall(r => r._3 == 0L && r._4 == 0L))
    // the one answer span appears in BOTH q3 context docs: each gets full
    // share (sums past 1e6 - redundant support is the point)
    assert(out.filter(_._1 == 3L).toSeq ==
      Seq((3L, 30L, 1L, 1000000L), (3L, 31L, 1L, 1000000L)))
    // a query whose answer is elsewhere: its docs appear with zero hits
    val none = Rag.attributionTable(
        Seq((1L, "nope nada zilch zero")).toDF("q_id", "answer"),
        "q_id", "answer", ctx, "doc_id", "text", n = 4)
      .filter($"q_id" === 1L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(none.toSeq == Seq((1L, 10L, 0L, 0L), (1L, 20L, 0L, 0L)))
  }

  test("groundedness ops refuse a non-integral context doc id") {
    // top_doc's -1 no-support sentinel lives in the id domain; a string
    // id would silently cast to null and coalesce onto the sentinel
    // (r14 ADVICE) - the contract is loud instead
    val a = Seq((1L, "alpha beta gamma delta")).toDF("q_id", "answer")
    val sctx = Seq((1L, "d1", "alpha beta gamma delta"))
      .toDF("q_id", "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Rag.groundednessAudit(a, "q_id", "answer", sctx, "doc_id", "text", 4)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    intercept[IllegalArgumentException] {
      Rag.attributionTable(a, "q_id", "answer", sctx, "doc_id", "text", 4)
    }
  }

  test("groundednessAudit: top-doc ties break to the smallest id") {
    val ctx2 = Seq(
      (9L, 5L, "red green blue cyan"),
      (9L, 3L, "red green blue cyan"))
      .toDF("q_id", "doc_id", "text")
    val a = Seq((9L, "red green blue cyan")).toDF("q_id", "answer")
    val r = Rag.groundednessAudit(a, "q_id", "answer", ctx2, "doc_id",
        "text", n = 4)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r._5 == 3L)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{Embed, Rag}

/** Serving-loop session state (reference: app.py:77-91,150-159) and the
  * noise-labeled density clustering that feeds the serving index (O11,
  * reference: PLATFORM-contextual-Chunking.py:83-114). */
class RagSessionSpec extends SparkSpec {
  import spark.implicits._

  test("sessionPrompt: multi-turn history folds in turn order into the reference scaffold") {
    // rows deliberately out of order — the fold must sort by the ordinal
    val history = Seq(
      (2L, "Second?", "Answer two."),
      (1L, "First?", "Answer one."))
      .toDF("turn", "question", "response")
    val got = Rag.sessionPrompt(history, "turn", "question", "response",
      comments = "- c1\n- c2", question = "Third?")
      .as[String].head()
    // hand-built golden, byte-for-byte the reference's f-string layout
    val golden =
      "You are a helpful assistant. You must base your answers **only** on the comments below.\n" +
      "Here are some relevant comments:\n" +
      "- c1\n- c2\n\n" +
      "\nUser: First?\nAssistant: Answer one." +
      "\nUser: Second?\nAssistant: Answer two." +
      "\n" +
      "User: Third?\nAssistant:"
    assert(got == golden)
  }

  test("sessionPrompt: empty history matches the reference's history=None branch") {
    val history = Seq.empty[(Long, String, String)].toDF("turn", "question", "response")
    val got = Rag.sessionPrompt(history, "turn", "question", "response",
      comments = "- only", question = "Q?")
      .as[String].head()
    assert(got ==
      "You are a helpful assistant. You must base your answers **only** on the comments below.\n" +
      "Here are some relevant comments:\n" +
      "- only\n\n" +
      "\n" +
      "User: Q?\nAssistant:")
  }

  test("densityClusters: small components become noise (-1), large keep their min id") {
    // 5 mutually-identical vectors (one dense cluster, >= minClusterSize),
    // a near-identical pair (component of 2 -> noise), and a singleton
    val base = Array.fill(8)(1.0)
    val pairV = Array(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)
    val lone = Array(-1.0, -1.0, -1.0, -1.0, 1.0, 1.0, 1.0, 1.0)
    val rows = (1L to 5L).map(i => (i, base)) ++
      Seq((10L, pairV), (11L, pairV), (20L, lone))
    val df = rows.toDF("vec_id", "embedding")
    val planes = graft.expr.VectorExprs.rademacherPlanes(numPlanes = 12, dim = 8, seed = 7L)
    val byId = Embed.densityClusters(df, "vec_id", "embedding",
      planes, bitsPerTable = 4, threshold = 0.9, minClusterSize = 5)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, c, n) => id -> ((c, n)) }.toMap
    // the 5-clone component survives with min-id label 1
    (1L to 5L).foreach(i => assert(byId(i) == (1L, false)))
    // the pair (size 2 < 5) and the singleton are noise
    assert(byId(10L) == (-1L, true))
    assert(byId(11L) == (-1L, true))
    assert(byId(20L) == (-1L, true))
  }

  test("contextDocs noise guard: a noise hit expands to NO co-cluster neighbors") {
    // hit vector is id 1 (identical to the query) labeled noise (-1);
    // ids 2,3 are also noise — without the guard they'd come back as
    // "neighbors of cluster -1"; id 10 is a real cluster and must not appear
    val v = Array(1.0, 0.0, 0.0, 0.0)
    val other = Array(0.0, 1.0, 0.0, 0.0)
    val index = Seq(
      (1L, v, -1L), (2L, v, -1L), (3L, v, -1L), (10L, other, 5L))
      .toDF("vec_id", "embedding", "cluster")
    val docs = Seq(1L, 2L, 3L, 10L).toDF("vec_id")
    val query = Seq(Tuple1(v)).toDF("qvec")
    val guarded = Rag.contextDocs(index, "vec_id", "embedding", "cluster",
        docs, "vec_id", query, threshold = 0.5, cap = 20, noiseLabel = Some(-1L))
      .as[Long].collect().sorted
    assert(guarded.toSeq == Seq(1L)) // just the hit
    val unguarded = Rag.contextDocs(index, "vec_id", "embedding", "cluster",
        docs, "vec_id", query, threshold = 0.5, cap = 20)
      .as[Long].collect().sorted
    assert(unguarded.toSeq == Seq(1L, 2L, 3L)) // legacy behavior preserved
  }
}

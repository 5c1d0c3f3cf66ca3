package graft

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, Vocab}

/** Wave 11: ANN recall audit (q122) and bigram-predictability LM scoring
  * (q123). */
class Wave11Spec extends SparkSpec {
  import spark.implicits._

  test("ivfKnnJoin probing every cell IS exact brute force") {
    // nprobe = nlist means no candidate is ever pruned, so the IVF route
    // must return row-identical top-k to knnJoin — the audit's calibration
    // point (recall_ppm would be exactly 1e6)
    val e = graft.io.Tables.embeddings(spark, sfDir)
    val qs = e.filter(col("vec_id") % 100 === 7L)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val nlist = e.select(col("label")).distinct().count().toInt
    val exact = Similarity.knnJoin(e, "vec_id", "embedding", qs, "q_id", "qvec", 5)
      .collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfKnnJoin(e, "vec_id", "embedding", "label",
        qs, "q_id", "qvec", nprobe = nlist, k = 5)
      .collect().map(_.toSeq).toSet
    assert(exact.nonEmpty && ivf == exact)
  }

  test("ivfRecallAudit: bounded hits, full-probe recall is exactly 1e6") {
    val e = graft.io.Tables.embeddings(spark, sfDir)
    val qs = e.filter(col("vec_id") % 100 === 7L)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val audit = Similarity.ivfRecallAudit(e, "vec_id", "embedding", "label",
        qs, "q_id", "qvec", nprobe = 3, k = 10)
      .as[(Long, Long, Long)].collect()
    assert(audit.length == qs.count())
    assert(audit.forall(a => a._2 >= 0L && a._2 <= 10L))
    assert(audit.forall(a => a._3 == a._2 * 100000L), "ppm = hits/10")
    val full = Similarity.ivfRecallAudit(e, "vec_id", "embedding", "label",
        qs, "q_id", "qvec",
        nprobe = e.select("label").distinct().count().toInt, k = 10)
      .as[(Long, Long, Long)].collect()
    assert(full.forall(_._3 == 1000000L), "probing every cell misses nothing")
  }

  test("bigramPredictability: hand corpus arithmetic") {
    // uni: a:3 b:2 c:1; bigrams: "a b" x2, "a c" x1
    //   doc 1/2: p = 2e6 div 3 = 666666; doc 3: p = 1e6 div 3 = 333333
    //   doc 4 (empty) and doc 5 (one token): no pairs -> (0, 0)
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, ""), (5L, "x"))
      .toDF("doc_id", "text")
    val out = Vocab.bigramPredictability(d, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, 666666L)))
    assert(out(2L) == ((1L, 666666L)))
    assert(out(3L) == ((1L, 333333L)))
    assert(out(4L) == ((0L, 0L)) && out(5L) == ((0L, 0L)))
  }

  test("trigramBackoffPredictability: every backoff branch, by hand") {
    // LM (train): "a b c" x2, "a b d" -> tri: abc:2 abd:1; bg: ab:3 bc:2 bd:1;
    // uni: a:3 b:3 c:2 d:1; N=9
    val lm = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d")).toDF("doc_id", "text")
    // scored docs exercise each branch:
    //  10: "a b c"  -> tri seen:  2*1e6 div 3            = 666666
    //  11: "x a b d" -> tg "x a b" unseen, suf "a b" seen: 3*400000 div 3 = 400000
    //                  tg "a b d" seen: 1*1e6 div 3       = 333333; mean = 366666
    //  12: "x y c"  -> tri+suf unseen, w3 "c" seen: 2*160000 div 9 = 35555
    //  13: "x y z"  -> nothing seen -> 0
    //  14: "a b"    -> no trigrams -> (0, 0)
    val docs = Seq((10L, "a b c"), (11L, "x a b d"), (12L, "x y c"),
      (13L, "x y z"), (14L, "a b")).toDF("doc_id", "text")
    val out = Vocab.trigramBackoffPredictability(docs, "doc_id", "text", lm)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) == ((1L, 666666L)))
    assert(out(11L) == ((2L, (400000L + 333333L) / 2)))
    assert(out(12L) == ((1L, 35555L)))
    assert(out(13L) == ((1L, 0L)))
    assert(out(14L) == ((0L, 0L)))
  }

  test("q129 packing sweep invariants: token total invariant, pack count monotone") {
    val rows = SparkEntry.queries("q129_packing_efficiency")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(128L, 256L, 512L, 1024L))
    // the corpus token total cannot depend on how it is packed
    assert(rows.map(_._3).distinct.size == 1)
    // doubling the capacity can only reduce (or keep) the pack count
    assert(rows.map(_._2) == rows.map(_._2).sorted.reverse)
    // fill is a ratio of totals: positive, and straddling chunks can
    // push it only marginally past 1e6
    assert(rows.forall(r => r._5 > 0L && r._5 < 1100000L))
  }

  test("wave-11 plans: equi-join pipelines only, spans stay codegen") {
    // executed-plan audit pinned: AQE broadcasts the vocab-sized count
    // tables, every join is an equi-join — a CartesianProduct here would
    // mean a join key was lost in a refactor
    Seq("q121_bpe_compression", "q123_bigram_predictability",
        "q125_bpe_segment_new", "q126_tokenizer_fertility",
        "q127_span_leak_audit", "q128_trigram_backoff").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct"), s"$q lost an equi-join key:\n$p")
    }
    val p = graft.io.Tables.documents(spark, sfDir)
      .select(explode(graft.expr.TextExprs.wordSpans(col("text"), 2)))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"bigram span projection fell out of codegen:\n$p")
  }

  test("semanticDecon: identical vector is flagged at sim 1.0, antipode stays clean") {
    // an identical vector lands in the SAME bucket of every table (same
    // sign pattern), so LSH can never miss it — flagged with sim 1.0. The
    // antipode flips every sign (different bucket in every table) and sits
    // at cosine -1 anyway — clean by both the candidate and verify stages.
    val planes = graft.expr.VectorExprs.rademacherPlanes(
      numPlanes = 36, dim = 4, seed = 42L)
    val train = Seq(
      (1L, Seq(1.0f, 0.2f, -0.3f, 0.5f)),
      (2L, Seq(-1.0f, -0.2f, 0.3f, -0.5f)),
      (3L, Seq(0.9f, 0.25f, -0.28f, 0.52f))).toDF("vec_id", "embedding")
    val ev = Seq((100L, Seq(1.0f, 0.2f, -0.3f, 0.5f)))
      .toDF("eval_id", "eval_vec")
    val out = Similarity.semanticDecon(train, "vec_id", "embedding",
        ev, "eval_id", "eval_vec", planes, bits = 6, threshold = 0.35)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(1) && out(1L).getLong(2) == 1L)
    assert(out(1L).getLong(3) == 100L && out(1L).getDouble(4) == 1.0)
    assert(!out(2L).getBoolean(1) && out(2L).getLong(2) == 0L)
    assert(out(2L).isNullAt(3) && out(2L).isNullAt(4))
    if (out(3L).getBoolean(1)) assert(out(3L).getDouble(4) >= 0.35)
  }

  test("semanticDecon with an empty eval set marks everything clean") {
    val e = graft.io.Tables.embeddings(spark, sfDir).limit(20)
    val planes = graft.expr.VectorExprs.rademacherPlanes(
      numPlanes = 36, dim = 64, seed = 42L)
    val out = Similarity.semanticDecon(e, "vec_id", "embedding",
        e.filter(lit(false)).select(col("vec_id").as("eval_id"),
          col("embedding").as("eval_vec")),
        "eval_id", "eval_vec", planes, bits = 6, threshold = 0.35)
      .collect()
    assert(out.length == 20)
    assert(out.forall(r => !r.getBoolean(1) && r.getLong(2) == 0L
      && r.isNullAt(3) && r.isNullAt(4)))
  }

  test("semanticDecon fixture invariants: train coverage, flag consistency") {
    val out = SparkEntry.queries("q124_semantic_decon")(spark, sfDir).collect()
    val e = graft.io.Tables.embeddings(spark, sfDir)
    assert(out.length == e.filter(col("vec_id") % 50 =!= 3L).count().toInt,
      "every train vector reports")
    out.foreach { r =>
      if (r.getBoolean(1)) {
        assert(r.getLong(2) >= 1L && r.getLong(3) % 50L == 3L,
          "a hit must point at an eval-set member")
        assert(r.getDouble(4) >= 0.35 && r.getDouble(4) <= 1.0)
      } else {
        assert(r.getLong(2) == 0L && r.isNullAt(3) && r.isNullAt(4))
      }
    }
  }

  test("bigramPredictability fixture invariants: total coverage, ppm range") {
    val docs = graft.io.Tables.documents(spark, sfDir)
    val out = SparkEntry.queries("q123_bigram_predictability")(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(out.length == docs.count().toInt, "every document reports")
    assert(out.forall(o => o._3 >= 0L && o._3 <= 1000000L),
      "a conditional probability cannot exceed 1")
    assert(out.exists(_._2 > 0L), "the fixture has multi-token documents")
    assert(out.filter(_._2 > 0L).forall(_._3 > 0L),
      "every observed bigram has probability at least 1/c(w1) > 0")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.Pq

/** Product-quantization semantics: codebook shape, encode contract, and
  * the ADC ≡ exact identity on a lossless corpus (n = k → every vector
  * seeds its own centroid → zero quantization error). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 distinct 4-dim vectors, subDim 2 → m = 2, k = 4: lossless PQ
  private lazy val vecs = Seq(
    (0L, Seq(0.1f, 0.2f, 0.9f, 0.8f)),
    (1L, Seq(0.5f, 0.4f, 0.1f, 0.2f)),
    (2L, Seq(0.9f, 0.8f, 0.5f, 0.4f)),
    (3L, Seq(0.3f, 0.7f, 0.2f, 0.6f)))
    .toDF("vec_id", "embedding")

  test("codebooks: one codebook per subspace, dloc spans the sub-dimensions") {
    val c = Pq.codebooks(vecs, "vec_id", "embedding", subDim = 2, k = 4, rounds = 2)
      .collect()
    val subs = c.map(_.getLong(0)).distinct.sorted
    assert(subs.toSeq == Seq(0L, 1L))
    assert(c.map(_.getLong(2)).forall(d => d >= 0 && d < 2)) // dloc
    // every (sub, j) centroid has exactly subDim components
    val bySubJ = c.groupBy(r => (r.getLong(0), r.getLong(1)))
    assert(bySubJ.values.forall(_.length == 2))
  }

  test("encode: m codes per vector, zero distortion when n = k") {
    val c = Pq.codebooks(vecs, "vec_id", "embedding", 2, 4, 2)
    val codes = Pq.encode(vecs, "vec_id", "embedding", c, 2).collect()
    assert(codes.length == 4 * 2) // n · m rows
    assert(codes.forall(_.getLong(3) == 0L)) // lossless → dist2 = 0
  }

  test("ADC equals exact integer L2 on a lossless corpus") {
    val c = Pq.codebooks(vecs, "vec_id", "embedding", 2, 4, 2)
    val codes = Pq.encode(vecs, "vec_id", "embedding", c, 2).drop("dist2")
    val q = vecs.select($"vec_id".as("q_id"), $"embedding".as("qvec"))
    val adc = Pq.adcTopK(codes, "vec_id", c, q, "q_id", "qvec", 2, 3)
      .select($"q_id", $"rank", $"vec_id", $"adc_dist2".as("d"))
    val exact = Pq.exactTopK(vecs, "vec_id", "embedding", q, "q_id", "qvec", 3)
      .select($"q_id", $"rank", $"vec_id", $"dist2".as("d"))
    assert(adc.exceptAll(exact).isEmpty && exact.exceptAll(adc).isEmpty)
  }

  test("recallAudit: perfect recall on a lossless corpus, truncation-aware denominator") {
    val q = vecs.select($"vec_id".as("q_id"), $"embedding".as("qvec"))
    // topK = 10 > n - 1 = 3 eligible neighbors: denominator must shrink
    val out = Pq.recallAudit(vecs, "vec_id", "embedding", q, "q_id", "qvec",
        2, 4, 2, topK = 10)
      .collect()
    assert(out.length == 4)
    assert(out.forall(_.getLong(2) == 3L)) // n_exact
    assert(out.forall(_.getLong(3) == 1000000L)) // recall
  }

  test("adcTopK excludes the query's own row") {
    val c = Pq.codebooks(vecs, "vec_id", "embedding", 2, 4, 2)
    val codes = Pq.encode(vecs, "vec_id", "embedding", c, 2).drop("dist2")
    val q = vecs.select($"vec_id".as("q_id"), $"embedding".as("qvec"))
    val out = Pq.adcTopK(codes, "vec_id", c, q, "q_id", "qvec", 2, 10).collect()
    assert(out.forall(r => r.getLong(0) != r.getLong(2)))
  }
}

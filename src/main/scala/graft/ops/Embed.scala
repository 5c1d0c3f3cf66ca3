package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashFns, VectorFns}

/** Embedding + clustering — the reference's "contextual chunking" core
  * (reference: PLATFORM-contextual-Chunking.py:52-94: SentenceTransformer
  * embedding + HDBSCAN labels).
  *
  * The embedder here is the deterministic hashing stand-in SURVEY.md §2.8 O8
  * calls for (no model downloads in this environment): text → token hash
  * buckets → L2-normalized count vector. In production the same operator
  * slot hosts a real model via mapPartitions; the engine-side contract
  * (column in, fixed-dim array<double> out, deterministic per text) is
  * identical.
  */
object Embed {

  /** O8 — deterministic hashing embedder: whitespace tokens hashed into
    * `dim` buckets (portable md5 bucket hash), counts L2-normalized and
    * rounded to 6 dp. Pure codegen'd expression — runs inside the scan
    * stage, no shuffle, no UDF. */
  def hashingEmbed(c: Column, dim: Int): Column = {
    val toks = split(Dedup.normalized(c), " ")
    val buckets = transform(toks, t => HashFns.md5Bucket(t, dim))
    val counts = transform(sequence(lit(0), lit(dim - 1)),
      i => size(filter(buckets, b => b === i.cast("long"))).cast("double"))
    transform(VectorFns.normalize(counts), x => round(x, 6))
  }

  /** xxhash64 variant of the same embedder — the faster spelling for the
    * 100 TB path (one 64-bit hash per token instead of md5). */
  def hashingEmbedFast(c: Column, dim: Int): Column = {
    val toks = split(Dedup.normalized(c), " ")
    val buckets = transform(toks, t => pmod(xxhash64(t), lit(dim.toLong)))
    val counts = transform(sequence(lit(0), lit(dim - 1)),
      i => size(filter(buckets, b => b === i.cast("long"))).cast("double"))
    transform(VectorFns.normalize(counts), x => round(x, 6))
  }

  /** O11 with the reference's NOISE semantics — density clustering over an
    * embedding column (reference: PLATFORM-contextual-Chunking.py:83-114 —
    * HDBSCAN, min_cluster_size 5, noise label −1): build the
    * cosine-threshold similarity graph with sign-RP LSH (candidate pairs
    * only within LSH buckets — an equi-join, the 100 TB path), take
    * connected components as density clusters, and label every member of a
    * component smaller than `minClusterSize` as noise (cluster = −1).
    *
    * Unlike HDBSCAN itself (mutual-reachability core distances no other
    * engine reproduces) every step here is exact deterministic arithmetic,
    * so the whole operator hash-checks against a SQL oracle — this is the
    * clustering family's oracle-covered representative; [[kmeansLabels]]
    * stays as the MLlib centroid form. */
  def densityClusters(df: DataFrame, idCol: String, vecCol: String,
      planes: Array[Array[Double]], bitsPerTable: Int, threshold: Double,
      minClusterSize: Int): DataFrame = {
    val pairs = Similarity.rpLshNearDup(df, idCol, vecCol, planes, bitsPerTable, threshold)
    Components.dedupClusters(df.select(col(idCol)), idCol, pairs, "id_a", "id_b")
      .select(col(idCol),
        when(col("comp_size") < minClusterSize, lit(-1L))
          .otherwise(col("component").cast("long")).as("cluster"),
        (col("comp_size") < minClusterSize).as("is_noise"))
  }

  /** O11 — seeded KMeans over an array<float>/array<double> vector column
    * (MLlib estimator, outside Catalyst — SURVEY.md §4.2). Returns the
    * input plus a `cluster` int column. Deterministic for a fixed seed and
    * input; excluded from the SQL oracle by design (invariant-tested). */
  def kmeansLabels(df: DataFrame, vecCol: String, k: Int, seed: Long,
      outCol: String = "cluster"): DataFrame = {
    val featured = df.withColumn("__features", array_to_vector(col(vecCol)))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("__features").setPredictionCol(outCol)
    model.fit(featured).transform(featured).drop("__features")
  }
}

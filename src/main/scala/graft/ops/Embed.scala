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

  /** O11 centroid form, engine-exact: Lloyd's iteration (the k-means
    * algorithm) over `floor(x·quantScale + 0.5)`-quantized integer
    * components, a FIXED number of rounds, deterministic hash-scattered
    * init (cluster j = the vector whose id sorts (j+1)-th by md5 of the
    * id string — portable to any SQL engine, uncorrelated with id order).
    * Every quantity is integer arithmetic — distances are Σ(q−c)² longs,
    * new centroids are FLOOR-divided component means via the
    * division-free positive-mod identity `(s − ((s mod n)+n) mod n) / n`
    * (plain integer division truncates toward zero in Spark but floors in
    * other engines; the identity makes the numerator exactly divisible so
    * every engine agrees) — so labels and distances hash-check against any
    * SQL engine, which MLlib's FP kmeans ([[kmeansLabels]]) never can.
    * Argmin ties break toward the smaller cluster id.
    *
    * Scale shape per round: the k·dim centroid table broadcasts (k is
    * user-fixed and small); assignment is a map-side join + one
    * (id)-keyed aggregation; re-centering one (cluster, dim)-keyed
    * aggregation. Work is n·dim·k per round — Lloyd's own cost — with
    * nothing driver-side. The exploded points frame is localCheckpointed
    * once so the `rounds + 1` passes re-read a materialized (id, d, q)
    * table instead of re-running the scan + explode each round.
    *
    * A cluster that captures no points in a round drops out (standard
    * empty-cluster behavior, mirrored identically by the oracle).
    * Output: (id, `cluster`, `dist2`). */
  def lloydQuantized(df: DataFrame, idCol: String, vecCol: String, k: Int,
      rounds: Int, quantScale: Double = 1000.0): DataFrame = {
    require(k >= 1 && rounds >= 1)
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("d", "v")))
      .withColumn("q", floor(col("v") * quantScale + 0.5).cast("long"))
      .drop("v")
      .localCheckpoint(false)
    // init: k seeds in portable-hash order of the id — md5 hex, which the
    // DuckDB oracle mirrors verbatim (xxhash64 has no DuckDB equivalent).
    // Hash-scatter keeps the determinism and oracle property of the former
    // k-smallest-ids init while decorrelating seed choice from id
    // assignment: low ids often cluster spatially (time-ordered ingest,
    // per-source id blocks), and seeding all k centroids inside one such
    // block degrades a fixed-round Lloyd's. Still TakeOrderedAndProject
    // (per-partition top-k heaps on the hash key) + a window over k rows.
    val seedOrd = Seq(md5(col("__id").cast("string").cast("binary")),
      col("__id"))
    val init = df.select(col(idCol).as("__id"), col(vecCol).as("__vec"))
      .orderBy(seedOrd: _*).limit(k)
      .withColumn("j", (row_number().over(Window.orderBy(seedOrd: _*)) - 1)
        .cast("long"))
      .select(col("j"), posexplode(col("__vec")).as(Seq("d", "v")))
      .withColumn("c", floor(col("v") * quantScale + 0.5).cast("long"))
      .drop("v")
    def assign(cents: DataFrame): DataFrame = pts
      .join(broadcast(cents), Seq("d"))
      .groupBy(col("__id"), col("j"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("dist2"))
      .groupBy(col("__id"))
      .agg(min(struct(col("dist2"), col("j"))).as("__a"))
      .select(col("__id"), col("__a.j").as("j"), col("__a.dist2").as("dist2"))
    val lastCents = (1 until rounds).foldLeft(init) { (cents, _) =>
      pts.join(assign(cents).drop("dist2"), Seq("__id"))
        .groupBy(col("j"), col("d"))
        .agg(sum(col("q")).as("__s"), count(lit(1)).as("__n"))
        .select(col("j"), col("d"),
          // pmod is already the positive modulus; the subtraction makes
          // the numerator exactly divisible, so the FP division is exact
          ((col("__s") - pmod(col("__s"), col("__n"))) / col("__n"))
            .cast("long").as("c"))
    }
    assign(lastCents).select(col("__id").as(idCol), col("j").as("cluster"),
      col("dist2"))
  }

  /** Embedding-batch sanity gate: flag vectors whose squared L2 norm falls
    * outside the Tukey fences `[q1 − 1.5·IQR, q3 + 1.5·IQR]` of the
    * corpus — the standard pre-index health check (an embedding whose
    * norm collapses toward 0 or explodes is a failed encode, and cosine
    * silently renormalizes it into the index).
    *
    * Exactness: norms are integer — `Σ floor(x·quantScale + 0.5)²` longs
    * (the q47 quantization convention) — and the quartiles come from
    * [[Quantiles.profile]]'s histogram spelling (bounded by the value
    * domain, never a per-group value buffer). For p = .25/.75 the type-7
    * interpolation and the fence arithmetic are all multiples of 0.25 at
    * magnitudes far under 2^53, so every double here is EXACT and the
    * verdict is engine-bitwise (DuckDB mirrors via quantile_cont).
    *
    * Output per vector: (id, norm2_q, is_low, is_high). */
  def normOutlierGate(df: DataFrame, idCol: String, vecCol: String,
      quantScale: Double = 1000.0): DataFrame = {
    val n2 = df
      .select(col(idCol), explode(col(vecCol)).as("v"))
      .withColumn("q", floor(col("v") * quantScale + 0.5).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("q") * col("q")).as("norm2_q"))
      .localCheckpoint(false) // feeds the fence pass AND the verdict join
    // quartiles via the two-phase rank-ceil order statistics: squared
    // norms are nearly ALL-DISTINCT, so the histogram-window spelling
    // (Quantiles.profile over one constant group) would sort the whole
    // per-vector frame on one task — the q216 class. Rank-ceil (type-1)
    // vs the old interpolated (type-7) quartiles moves a fence by less
    // than one observed value; Tukey's 1.5·IQR rule is an estimator
    // heuristic either way, and this spelling is integer-exact.
    val fences = Quantiles.orderStatistics(n2, "norm2_q", idCol, Seq(25, 75))
      .agg(min(when(col("p") === 25L, col("norm2_q"))).as("__q1"),
        min(when(col("p") === 75L, col("norm2_q"))).as("__q3"))
    n2.crossJoin(broadcast(fences)) // 1 row — statically bounded
      .select(col(idCol), col("norm2_q"),
        (col("norm2_q").cast("double") <
          col("__q1") - lit(1.5) * (col("__q3") - col("__q1"))).as("is_low"),
        (col("norm2_q").cast("double") >
          col("__q3") + lit(1.5) * (col("__q3") - col("__q1"))).as("is_high"))
  }

  /** Label-centroid separation report — the embedding-space class-QA a
    * weak-label corpus ships: per label pair (a < b), the cosine between
    * the labels' integer centroids, next to each side's member count and
    * within-label dispersion (mean squared distance to own centroid). A
    * healthy label space has inter-centroid cosines well under 1 and
    * dispersions of the same order across labels; a collapsed pair
    * (cos → 1) or a blown-up label flags annotation noise.
    *
    * Integer discipline: vectors quantize to `floor(x·quantScale+0.5)`
    * longs; centroids use the exact-floor mean (the pmod spelling);
    * dispersion is a truncating integer mean of Σ_d (q−c)²; only the
    * final cosine is FP — `round(num/sqrt(qa·qb), 6)`, the q47
    * convention (sqrt is IEEE-exact, the int64→double casts identical in
    * both engines).
    *
    * Output: (label_a, label_b, n_a, n_b, cos6, within_a, within_b).
    * Scale shape: two map-combined aggregates over the exploded frame
    * (centroid + dispersion, keyed by label), then all pair arithmetic
    * on the |labels|·dim centroid frame — corpus touched twice,
    * never self-joined. */
  def labelCentroidSeparation(df: DataFrame, idCol: String,
      labelCol: String, vecCol: String,
      quantScale: Double = 1000.0): DataFrame = {
    val pts = df.select(col(labelCol).as("__l"), col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(col("__l"), col("__id"), col("d"),
        floor(col("x") * quantScale + 0.5).cast("long").as("q"))
      .localCheckpoint(false)
    val cent = pts.groupBy(col("__l"), col("d"))
      .agg(sum(col("q")).as("__s"), count(lit(1)).as("__n"))
      .select(col("__l"), col("d"),
        ((col("__s") - pmod(col("__s"), col("__n"))) / col("__n"))
          .cast("long").as("c"),
        col("__n").as("n"))
    val within = pts.join(cent.select(col("__l"), col("d"), col("c")),
        Seq("__l", "d"))
      .groupBy(col("__l"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("__sq"),
        countDistinct(col("__id")).as("n_members"))
      .select(col("__l"), expr("__sq div n_members").as("within"),
        col("n_members"))
    val pairs = cent.as("a").join(cent.as("b"),
        col("a.d") === col("b.d") && col("a.__l") < col("b.__l"))
      .groupBy(col("a.__l").as("label_a"), col("b.__l").as("label_b"))
      .agg(sum(col("a.c") * col("b.c")).as("__num"),
        sum(col("a.c") * col("a.c")).as("__qa"),
        sum(col("b.c") * col("b.c")).as("__qb"))
      // greatest(…,1): a label whose floor-mean rounds to the zero
      // vector (symmetric noise at scale) defines cos = 0, not a
      // divide-by-zero — num is 0 whenever either norm is
      .withColumn("cos6", round(col("__num").cast("double") /
        sqrt(greatest(col("__qa") * col("__qb"), lit(1L)).cast("double")), 6))
    pairs
      .join(within.select(col("__l").as("label_a"),
        col("within").as("within_a"), col("n_members").as("n_a")),
        Seq("label_a"))
      .join(within.select(col("__l").as("label_b"),
        col("within").as("within_b"), col("n_members").as("n_b")),
        Seq("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("cos6"), col("within_a"), col("within_b"))
  }
}

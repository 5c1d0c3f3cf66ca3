package graft.io

import org.apache.spark.sql.SparkSession

/** Object-store (S3-compatible) session recipe.
  *
  * The reference reads and writes MinIO buckets through the S3A connector
  * (reference: config_miniO.py:4-9 constructs a MinIO client;
  * REDDIT-Nettoyage-Posts.py:18-27 sets `spark.hadoop.fs.s3a.endpoint`,
  * `…access.key`, `…secret.key`, `…path.style.access` on the session
  * builder, with the secrets INLINE in source). This helper is the same
  * surface done right:
  *
  *   - only public Hadoop S3A options (`fs.s3a.*`, hadoop-aws module);
  *   - credentials come from the caller or the default provider chain
  *     (env vars / instance profile), never from source;
  *   - the 100 TB knobs the reference leaves at defaults are set:
  *     connection pool sized for 32+ concurrent readers, multipart
  *     uploads, and the magic committer (task commit = metadata op, no
  *     object-store rename, which on S3 is a copy).
  *
  * The options are inert strings until `hadoop-aws` (and its AWS SDK
  * bundle) is on the cluster classpath — this repo's offline container
  * doesn't ship it, so [[ObjectStoreSpec]] asserts the conf surface, not a
  * live read. On a real cluster:
  *
  * {{{
  * val spark = ObjectStore.minio(
  *   SparkSession.builder().appName("ingest"),
  *   endpoint = "http://minio:9000",
  *   accessKey = sys.env("AWS_ACCESS_KEY_ID"),
  *   secretKey = sys.env("AWS_SECRET_ACCESS_KEY")).getOrCreate()
  * spark.read.parquet("s3a://donneesbrutes/reddit/posts/")
  * }}}
  */
object ObjectStore {

  /** hadoop-aws options shared by every S3-compatible endpoint; tuned for
    * many-executor scans rather than the single-laptop defaults. */
  private val scaleDefaults: Seq[(String, String)] = Seq(
    // one pooled connection per scan thread, not the default 96-global
    "spark.hadoop.fs.s3a.connection.maximum" -> "256",
    "spark.hadoop.fs.s3a.threads.max" -> "64",
    // stream uploads as 64 MiB multiparts from memory-bounded buffers
    "spark.hadoop.fs.s3a.fast.upload" -> "true",
    "spark.hadoop.fs.s3a.multipart.size" -> "67108864",
    // ranged GETs for parquet footers/columns instead of full-object reads
    "spark.hadoop.fs.s3a.experimental.input.fadvise" -> "random",
    // vectored IO: coalesce nearby column-chunk ranges into one GET
    "spark.hadoop.fs.s3a.vectored.read.min.seek.size" -> "131072",
    // commit via the S3A magic committer: no rename (S3 rename = copy),
    // task commit is one metadata write — the only correct committer shape
    // for a 1000-executor write
    "spark.hadoop.fs.s3a.committer.magic.enabled" -> "true",
    "spark.hadoop.fs.s3a.committer.name" -> "magic",
    "spark.sql.sources.commitProtocolClass" ->
      "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class" ->
      "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter")

  /** Option map for any S3-compatible store — pure, so the conf surface is
    * unit-testable without a live endpoint. Credentials are OPTIONAL: when
    * absent, the default provider chain resolves them from the
    * environment/instance profile — never inline secrets in source
    * (the reference does: config_miniO.py:6-7). */
  def s3aOptions(
      endpoint: Option[String] = None,
      accessKey: Option[String] = None,
      secretKey: Option[String] = None,
      pathStyleAccess: Boolean = false,
      sslEnabled: Boolean = true): Map[String, String] =
    scaleDefaults.toMap ++
      endpoint.map("spark.hadoop.fs.s3a.endpoint" -> _) ++
      accessKey.map("spark.hadoop.fs.s3a.access.key" -> _) ++
      secretKey.map("spark.hadoop.fs.s3a.secret.key" -> _) ++
      Map(
        "spark.hadoop.fs.s3a.path.style.access" -> pathStyleAccess.toString,
        "spark.hadoop.fs.s3a.connection.ssl.enabled" -> sslEnabled.toString)

  /** Apply [[s3aOptions]] to a session builder. */
  def s3a(builder: SparkSession.Builder,
      endpoint: Option[String] = None,
      accessKey: Option[String] = None,
      secretKey: Option[String] = None,
      pathStyleAccess: Boolean = false,
      sslEnabled: Boolean = true): SparkSession.Builder =
    s3aOptions(endpoint, accessKey, secretKey, pathStyleAccess, sslEnabled)
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }

  /** MinIO preset — the reference's deployment shape: explicit endpoint,
    * path-style addressing (MinIO serves buckets on the path, not a
    * subdomain), plain HTTP inside the compose network
    * (reference: REDDIT-Nettoyage-Posts.py:23-26). */
  def minioOptions(endpoint: String, accessKey: String,
      secretKey: String): Map[String, String] =
    s3aOptions(Some(endpoint), Some(accessKey), Some(secretKey),
      pathStyleAccess = true, sslEnabled = endpoint.startsWith("https://"))

  /** Apply [[minioOptions]] to a session builder. */
  def minio(builder: SparkSession.Builder, endpoint: String,
      accessKey: String, secretKey: String): SparkSession.Builder =
    minioOptions(endpoint, accessKey, secretKey)
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.ObjectStore

/** S3A/MinIO session recipe (reference: config_miniO.py:4-9,
  * REDDIT-Nettoyage-Posts.py:18-27). The hadoop-aws module isn't shipped in
  * this offline container, so these assert the conf SURFACE — every key the
  * reference sets plus the scale knobs it leaves at defaults — not a live
  * read. Pure map, no session needed. */
class ObjectStoreSpec extends AnyFunSuite {

  test("minio preset matches the reference's connector surface") {
    val opts = ObjectStore.minioOptions("http://minio:9000", "AK", "SK")
    // the four keys the reference sets explicitly
    assert(opts("spark.hadoop.fs.s3a.endpoint") == "http://minio:9000")
    assert(opts("spark.hadoop.fs.s3a.access.key") == "AK")
    assert(opts("spark.hadoop.fs.s3a.secret.key") == "SK")
    assert(opts("spark.hadoop.fs.s3a.path.style.access") == "true")
    // http endpoint ⇒ ssl off; https flips it
    assert(opts("spark.hadoop.fs.s3a.connection.ssl.enabled") == "false")
    val https = ObjectStore.minioOptions("https://minio:9000", "AK", "SK")
    assert(https("spark.hadoop.fs.s3a.connection.ssl.enabled") == "true")
  }

  test("credential-less s3a defers to the provider chain and keeps scale knobs") {
    val opts = ObjectStore.s3aOptions()
    // no secrets materialize anywhere unless the caller passes them
    assert(!opts.contains("spark.hadoop.fs.s3a.access.key"))
    assert(!opts.contains("spark.hadoop.fs.s3a.secret.key"))
    // 100 TB knobs: pooled connections, multipart upload, magic committer
    // (no S3 rename-as-copy in the commit path)
    assert(opts("spark.hadoop.fs.s3a.connection.maximum").toInt >= 96)
    assert(opts("spark.hadoop.fs.s3a.fast.upload") == "true")
    assert(opts("spark.hadoop.fs.s3a.committer.name") == "magic")
    assert(opts("spark.sql.sources.commitProtocolClass").contains("PathOutputCommitProtocol"))
  }

  test("builder application is inert config only (no fs resolution)") {
    // applying to a builder must not touch any filesystem or network —
    // just accumulate string confs; building against the already-running
    // test session must also not throw
    val b = ObjectStore.minio(
      org.apache.spark.sql.SparkSession.builder(), "http://minio:9000", "AK", "SK")
    assert(b != null)
  }
}

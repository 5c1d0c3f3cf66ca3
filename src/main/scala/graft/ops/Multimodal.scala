package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A binary multimodal asset row: opaque content bytes + typed metadata.
  * (Top-level case classes so Spark derives product Encoders.) */
case class Asset(asset_id: Long, kind: String, content: Array[Byte],
    width: Int, height: Int, sample_rate: Int)

/** Deterministic per-asset features produced by the (stubbed) decoder. */
case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
    byte_sum: Long, fp: String)

/** Multimodal column plumbing — treat image/audio/video as opaque `binary`
  * columns with typed metadata (builder-prompt extension; the reference has
  * no multimodal data). The image/audio codecs are NOT in this container,
  * so the decode step is a clearly-marked deterministic STUB; everything
  * Spark-side — schema, encoders, mapPartitions batch shape, partition-wise
  * decoder lifecycle, frame-sampling expansion — is real and tested.
  *
  * At 100 TB the decode runs as `mapPartitions` so a real codec is
  * initialized once per partition (not per row), exactly where the stub's
  * MessageDigest is created below.
  */
object Multimodal {

  /** Build an asset table from a text table (deterministic fake content:
    * the UTF-8 bytes of the text; metadata derived from the id). Real
    * ingestion would read image/audio files via `spark.read.format
    * ("binaryFile")` into the same schema. */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(kind).as("kind"),
      col(textCol).cast("binary").as("content"),
      (pmod(col(idCol), lit(16)) * 64 + 64).cast("int").as("width"),
      (pmod(col(idCol), lit(9)) * 64 + 64).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  /** Decode / feature-extract over binary content.
    *
    * STUB: a real implementation hosts an image/audio codec here (one init
    * per partition, batch iteration per row — the exact shape below). The
    * stand-in emits deterministic features of the raw bytes: length,
    * unsigned byte sum, md5 hex — reproducible by any engine, so the
    * plumbing itself is oracle-checkable. */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("asset_id"), col("kind"), col("content"),
        col("width"), col("height"), col("sample_rate"))
      .as[Asset]
      .mapPartitions { it =>
        // per-partition init — where a real codec/model would be loaded once
        val digest = MessageDigest.getInstance("MD5")
        it.map { a =>
          val bytes = if (a.content == null) Array.emptyByteArray else a.content
          digest.reset()
          val fp = digest.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
          AssetFeatures(a.asset_id, a.kind, bytes.length.toLong,
            bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff)), fp)
        }
      }
      .toDF()
  }

  /** Resize for image-like assets.
    *
    * STUB: a real implementation decodes, resamples, and re-encodes inside
    * the same mapPartitions shape as [[decodeFeatures]] (codec init once
    * per partition). The stand-in updates the metadata contract exactly —
    * new width/height, content passed through, aspect flag — so downstream
    * schema/partitioning is real and testable without image libs. */
  def resizeStub(df: DataFrame, newWidth: Int, newHeight: Int): DataFrame =
    df.withColumn("orig_width", col("width"))
      .withColumn("orig_height", col("height"))
      .withColumn("width", lit(newWidth))
      .withColumn("height", lit(newHeight))
      .withColumn("aspect_changed",
        (col("orig_width") * newHeight) =!= (col("orig_height") * newWidth))

  /** Frame-sampling expansion for video-like assets: one row per sampled
    * frame at `everyNBytes` stride (stand-in for a time stride), with the
    * frame's byte slice as content. Pure codegen'd explode — the real
    * decode of each frame slice would again be a mapPartitions stage. */
  def frameSample(df: DataFrame, everyNBytes: Int): DataFrame =
    df.select(col("asset_id"), col("content"))
      .withColumn("frame_off",
        explode(sequence(lit(1), greatest(length(col("content")), lit(1)), lit(everyNBytes))))
      .select(
        col("asset_id"),
        ((col("frame_off") - 1) / everyNBytes).cast("long").as("frame_idx"),
        col("content").substr(col("frame_off"), lit(everyNBytes)).as("frame_bytes"))
}

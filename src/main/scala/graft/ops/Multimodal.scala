package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as batched per-partition transforms (the Scala
  * analog of `mapInPandas` — one JVM call per batch, vectorizable).
  *
  * The actual codec step is STUBBED (no image/audio libraries ship in this
  * container): `FakeCodec` produces deterministic pseudo-features from the
  * bytes, so the Spark-side plumbing — schema, partitioning, batch shape,
  * null/err handling — is real and tested, and swapping in a real codec is a
  * one-function change.
  */
object Multimodal {

  /** Media rows use the core model's sidecar shape ([[graft.model.MediaRef]],
    * docler's `Image`, docler_api/routes.py:62-64).
    */
  type MediaRow = graft.model.MediaRef
  val MediaRow = graft.model.MediaRef

  final case class MediaFeatures(
      doc_id: String,
      media_ref: String,
      mime_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      channels: Int,
      mean_luma: Double,
      phash: Long,
      decode_error: String)

  /** STUB codec: deterministic pseudo-decode. A real deployment swaps this
    * single function for an ImageIO/ffmpeg call — everything around it
    * (schema, batching, error capture) is production-shaped.
    */
  object FakeCodec {
    def decode(mime: String, bytes: Array[Byte]): (Int, Int, Int, Double, Long) = {
      if (bytes == null || bytes.isEmpty) throw new IllegalArgumentException("empty payload")
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
      val width = 16 + math.floorMod(h, 1024).toInt
      val height = 16 + math.floorMod(h >>> 16, 1024).toInt
      val channels = if (mime.contains("png")) 4 else 3
      val luma = math.floorMod(h >>> 8, 256).toDouble / 255.0
      (width, height, channels, luma, h)
    }
  }

  /** Feature extraction over the media table: batched per-partition map.
    * Decode failures become rows with `decode_error` set (lineage-friendly),
    * never task failures.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        try {
          val (w, h, c, luma, ph) = FakeCodec.decode(r.mime_type, r.content)
          MediaFeatures(r.doc_id, r.media_ref, r.mime_type,
            if (r.content == null) 0 else r.content.length, w, h, c,
            math.rint(luma * 10000) / 10000, ph, "")
        } catch {
          case e: Exception =>
            MediaFeatures(r.doc_id, r.media_ref, r.mime_type,
              if (r.content == null) 0 else r.content.length,
              0, 0, 0, 0.0, 0L, s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
  }

  /** Frame-sampling plumbing for video-shaped payloads: emits one row per
    * sampled frame index (uniform stride), payload decode stubbed. Shows the
    * 1→N generator shape with bounded output.
    */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int = 10, maxFrames: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val pseudoFrameCount = 1 + math.floorMod(
        r.media_ref.hashCode.toLong + (if (r.content == null) 0 else r.content.length), 300).toInt
      (0 until pseudoFrameCount by everyNth).take(maxFrames).map { f =>
        (r.doc_id, r.media_ref, f, pseudoFrameCount)
      }
    }.toDF("doc_id", "media_ref", "frame_idx", "n_frames")
  }

  /** Build a deterministic media table from docs' image spans (payload bytes
    * synthesized from the ref — the fixture path; production reads the real
    * sidecar table).
    */
  def syntheticMediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "image")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
      .withColumn("mime_type", concat(lit("image/"), regexp_extract(col("media_ref"), "\\.(\\w+)$", 1)))
      .as[(String, String, String)]
      .map { case (id, ref, mime) => MediaRow(id, ref, mime, s"$id/$ref".getBytes("UTF-8")) }
  }
}

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
  * one-function change. The stub arithmetic is mod-(2^31-1) byte folding, so
  * a SQL oracle (DuckDB) reproduces every feature exactly.
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

  /** The real extraction sidecar as a typed media table: payload bytes from
    * the docs table's media column (parquet column pruning — span readers
    * never touch it).
    */
  def mediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.pipeline.Pipeline.toMediaDF(docs).as[MediaRow]
  }

  /** STUB codec: deterministic pseudo-decode. A real deployment swaps this
    * single function for an ImageIO/ffmpeg call — everything around it
    * (schema, batching, error capture) is production-shaped. All arithmetic
    * is mod 2^31-1 (no 64-bit wraparound), so the features are reproducible
    * in ANSI SQL engines for oracle checking.
    */
  object FakeCodec {
    final val P: Long = 2147483647L // 2^31 - 1

    /** (h*31 + byte) mod P fold — the same shape as TextAnalysis.fingerprint. */
    def foldHash(bytes: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xffL)) % P; i += 1 }
      h
    }

    def decode(mime: String, bytes: Array[Byte]): (Int, Int, Int, Double, Long) = {
      if (bytes == null || bytes.isEmpty) throw new IllegalArgumentException("empty payload")
      val h = foldHash(bytes)
      val width = 16 + (h % 1024).toInt
      val height = 16 + ((h / 1024) % 1024).toInt
      val channels = if (mime.contains("png")) 4 else 3
      val luma = math.rint(((h / 16) % 256).toDouble / 255.0 * 10000) / 10000
      (width, height, channels, luma, h)
    }
  }

  /** Feature extraction over the media table: batched per-partition map.
    * Decode failures (including payload-less refs, where the source carried
    * only a reference) become rows with `decode_error` set (lineage-friendly),
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
            if (r.content == null) 0 else r.content.length, w, h, c, luma, ph, "")
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
    * sampled frame index (uniform stride), payload decode stubbed (the
    * pseudo frame count is the portable byte fold). Shows the 1→N generator
    * shape with bounded output.
    */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int = 10, maxFrames: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val bytes = if (r.content == null) Array.emptyByteArray else r.content
      val pseudoFrameCount = 1 + ((FakeCodec.foldHash(bytes) + bytes.length) % 300).toInt
      (0 until pseudoFrameCount by everyNth).take(maxFrames).map { f =>
        (r.doc_id, r.media_ref, f, pseudoFrameCount)
      }
    }.toDF("doc_id", "media_ref", "frame_idx", "n_frames")
  }

  /** Deterministic ASCII-safe payload bytes for documents-derived media —
    * THE single definition of the convention shared by
    * [[docDerivedMediaTable]], `SparkEntry.docsFromDocuments`, and the SQL
    * oracles (which fold CHARACTERS, so non-ASCII must be squashed to '?'
    * on both sides for byte/char equivalence).
    */
  def docPayload(id: String, source: String): Array[Byte] =
    s"$id:${source.replaceAll("[^ -~]", "?")}".getBytes("UTF-8")

  /** Which documents-derived media rows a doc carries: every third doc a
    * png (img-0.png), every sixth additionally a jpg (img-1.jpg).
    */
  def docDerivedRefs(id: Long): Seq[(String, String)] =
    (if (id % 3 == 0) Seq("img-0.png" -> "image/png") else Nil) ++
      (if (id % 6 == 0) Seq("img-1.jpg" -> "image/jpeg") else Nil)

  /** A deterministic media table DERIVED FROM the relational `documents`
    * table — the oracle-checkable input for the feature/frame plumbing,
    * since the real extraction sidecar's synthetic corpus is not visible to
    * the SQL oracle.
    */
  def docDerivedMediaTable(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("string").as("doc_id"), col("source"))
      .as[(String, String)]
      .flatMap { case (id, source) =>
        val payload = docPayload(id, source)
        docDerivedRefs(id.toLong).map { case (ref, mime) => MediaRow(id, ref, mime, payload) }
      }
  }
}

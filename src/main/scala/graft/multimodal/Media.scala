package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline at 100 TB:
  * image/audio/video travel as opaque `binary` columns next to a typed
  * metadata struct; decode/feature steps run per-partition over batches of
  * rows (the Scala analogue of `mapInPandas` — one iterator per partition,
  * vectorizable, no per-row UDF dispatch).
  *
  * DECODE IS A STUB: this container has no image/audio codecs, so
  * [[FakeCodec]] derives deterministic pseudo-metadata from the blob's md5
  * — clearly marked, swappable for a real codec binding. Everything
  * AROUND the decode — the binary schema, the partition-iterator batch
  * shape, the feature-struct output schema, the downstream aggregations —
  * is real and oracle-verified (the fake values are md5-reproducible in
  * DuckDB).
  */
object Media {

  /** One media row: opaque bytes + the metadata a real ingest would carry. */
  case class MediaRow(media_id: Long, modality: String, content: Array[Byte])

  /** Extracted per-media features (what a real decoder would emit). */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,         // image/video: fake-decoded dims
      height: Int,
      n_frames: Int,      // video: sampled frame count; 1 for image, 0 audio
      feature: Array[Double]) // 8-dim embedding stand-in

  /** STUB codec — replace with real JNI/codec bindings in production.
    * All values are pure functions of md5(content) so the pipeline is
    * deterministic and externally checkable.
    */
  object FakeCodec {
    def md5Hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString

    private def nib(h: String, i: Int): Int =
      Character.digit(h.charAt(i), 16)

    def decode(row: MediaRow): MediaFeatures = {
      val h = md5Hex(row.content)
      val width = 16 * (1 + nib(h, 0))   // 16..256
      val height = 16 * (1 + nib(h, 1))
      val frames = row.modality match {
        case "video" => 1 + nib(h, 2)    // deterministic frame-sample count
        case "image" => 1
        case _       => 0
      }
      val feat = (0 until 8).map(i => nib(h, 8 + i) / 15.0).toArray
      MediaFeatures(row.media_id, row.modality, row.content.length,
        width, height, frames, feat)
    }
  }

  /** The corpus has no real media files; stand in opaque blobs derived from
    * `documents.text` (utf-8 bytes) with a modality assignment — the
    * PLUMBING (binary column, partition batching) is what's exercised.
    */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** Partition-batched decode: one codec context per partition (the real
    * pattern for libjpeg/ffmpeg handles), iterator in / iterator out.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec context here, close at iterator end
      rows.map(FakeCodec.decode)
    }
  }

  /** One sampled video frame (what a real frame extractor would emit). */
  case class FrameRow(
      media_id: Long,
      frame_idx: Int,     // 1-based index into the decoded frame sequence
      ts_ms: Int,         // presentation timestamp (fake 25 fps)
      phash: String,      // 64-bit perceptual-hash stand-in (md5 prefix)
      is_keyframe: Boolean)

  /** Frame sampling: every `stride`-th frame of each video becomes one
    * image-like training row. Same per-partition batch shape as
    * [[extractFeatures]] (a real impl holds one ffmpeg context per
    * partition and seeks); per-frame values are md5-derived so the whole
    * sampling pipeline stays externally checkable.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open demuxer/decoder context here, close at iterator end
      rows.filter(_.modality == "video").flatMap { r =>
        val h = FakeCodec.md5Hex(r.content)
        val nFrames = 1 + Character.digit(h.charAt(2), 16)
        (1 to nFrames by stride).iterator.map { i =>
          val fh = FakeCodec.md5Hex(s"$h:$i".getBytes("UTF-8"))
          FrameRow(r.media_id, i, (i - 1) * 40, fh.substring(0, 16),
            Character.digit(fh.charAt(16), 16) < 4)
        }
      }
    }
  }

  /** Deterministic "resize": recompute features at a target size — shape
    * stands in for a real thumbnail kernel; output schema is the contract.
    */
  def resize(features: Dataset[MediaFeatures], maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    features.toDF().select(
      col("media_id"), col("modality"),
      floor(col("width") * scale).cast("int").as("width"),
      floor(col("height") * scale).cast("int").as("height"))
  }
}

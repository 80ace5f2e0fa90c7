package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline at 100 TB:
  * image/audio/video travel as opaque `binary` columns next to a typed
  * metadata struct; decode/feature steps run per-partition over batches of
  * rows (the Scala analogue of `mapInPandas` — one iterator per partition,
  * vectorizable, no per-row UDF dispatch).
  *
  * The IMAGE path is a REAL codec: the corpus's image rows carry genuine
  * PNG bytes (deterministically rendered, so the table is reproducible) and
  * [[ImageCodec]] decodes them with `javax.imageio` — width/height come
  * from decoded pixels, and the DuckDB oracle independently re-parses the
  * PNG IHDR header from the exported blob, so a wrong decode fails the
  * value compare. AUDIO/VIDEO decode remains a STUB ([[FakeCodec]], this
  * container has no audio/video codecs): deterministic pseudo-metadata from
  * the blob's digest — clearly marked, swappable for an ffmpeg-class
  * binding; everything around it (binary schema, partition-iterator batch
  * shape, output schema, downstream aggregations) is real and
  * oracle-verified.
  */
object Media {

  /** One media row: opaque bytes + the metadata a real ingest would carry. */
  case class MediaRow(media_id: Long, modality: String, content: Array[Byte])

  /** Extracted per-media features (what a real decoder would emit). */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,         // image: REAL decoded dims; audio/video: stub
      height: Int,
      n_frames: Int,      // video: sampled frame count; 1 for image, 0 audio
      feature: Array[Double]) // 8-dim embedding stand-in

  /** Digest shared with the DuckDB oracle: md5 over the UPPERCASE hex
    * encoding of the bytes. DuckDB's `md5` accepts only VARCHAR and PNG
    * bytes are not valid UTF-8, so both engines hex first (Spark's `hex`
    * and DuckDB's `hex` both emit uppercase); `md5(hex(content))` is then
    * byte-identical across engines.
    */
  private val HexUpper = "0123456789ABCDEF".toCharArray
  private val HexLower = "0123456789abcdef".toCharArray

  private def hexChars(b: Array[Byte], table: Array[Char]): Array[Char] = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xFF
      out(i * 2) = table(v >> 4)
      out(i * 2 + 1) = table(v & 0xF)
      i += 1
    }
    out
  }

  def hexDigest(b: Array[Byte]): String = {
    // table-lookup hex, NOT per-byte String.format: this runs over every
    // byte of every blob (a 60 KB PNG is 120 k format calls the old way —
    // profiled as the entire media-pack hot path at 10× scale)
    val hx = new String(hexChars(b, HexUpper)).getBytes("US-ASCII")
    val dig = java.security.MessageDigest.getInstance("MD5").digest(hx)
    new String(hexChars(dig, HexLower))
  }

  private def nib(h: String, i: Int): Int = Character.digit(h.charAt(i), 16)

  /** REAL image codec over `javax.imageio` (PNG/JPEG — the formats the JDK
    * ships decoders for; a production build would swap in libjpeg-turbo /
    * libvips behind the same two functions).
    */
  object ImageCodec {

    // ImageIO defaults to a DISK-backed stream cache: every read/write
    // spills through a temp file, so a 50 k-image decode pass becomes
    // 50 k file creations contending on /tmp (measured 2× pass-to-pass
    // jitter at 10× scale). All our containers are in-memory byte arrays —
    // cache in memory.
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic render + PNG encode: the stand-in for genuine ingest
      * bytes. Pixels are a pure function of (seed, x, y), so the encoded
      * bytes — and everything the oracle derives from them — are stable
      * across runs.
      */
    def encodePng(width: Int, height: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = new Array[Int](width * height)
      var y = 0; var i = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          px(i) = (((x + seed) & 0xFF) << 16) |
            (((y + (seed >> 8)) & 0xFF) << 8) |
            (((x ^ y) + (seed >> 16)) & 0xFF)
          x += 1; i += 1
        }
        y += 1
      }
      img.setRGB(0, 0, width, height, px, 0, width)
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode real image bytes (any ImageIO-supported container: PNG,
      * JPEG, ...) → (width, height) from the decoded pixel raster.
      */
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "ImageCodec: undecodable image bytes")
      (img.getWidth, img.getHeight)
    }
  }

  /** STUB codec for AUDIO/VIDEO only — replace with real JNI/codec bindings
    * in production. All values are pure functions of [[hexDigest]](content)
    * so the pipeline is deterministic and externally checkable.
    */
  object FakeCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val h = hexDigest(row.content)
      val width = 16 * (1 + nib(h, 0))   // 16..256
      val height = 16 * (1 + nib(h, 1))
      val frames = row.modality match {
        case "video" => 1 + nib(h, 2)    // deterministic frame-sample count
        case _       => 0
      }
      MediaFeatures(row.media_id, row.modality, row.content.length,
        width, height, frames, featureOf(h))
    }
  }

  /** 8-dim embedding stand-in from the digest — common to all modalities. */
  private def featureOf(h: String): Array[Double] =
    (0 until 8).map(i => nib(h, 8 + i) / 15.0).toArray

  /** The corpus has no ingest media files; IMAGE rows get genuine
    * deterministically-rendered PNG bytes (dims/seed derived from the doc
    * text digest), audio/video rows carry opaque utf-8 blobs. Encoding runs
    * per-partition — the same batch shape as the decode side.
    */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    spread(docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow])
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.modality != "image") r
          else {
            val h = hexDigest(r.content)
            val w = 16 * (1 + nib(h, 0))
            val ht = 16 * (1 + nib(h, 1))
            val seed = Integer.parseInt(h.substring(0, 6), 16)
            r.copy(content = ImageCodec.encodePng(w, ht, seed))
          }
        }
      }
  }

  /** Codec stages are CPU-bound, but a packed-blob parquet export reads as
    * far fewer splits than there are cores (tens of KB per row → hundreds
    * of rows per 128 MB split): without a spread, a 50 k-image decode ran
    * on ~6 of 32 threads. Repartition up to the session parallelism before
    * any per-partition codec loop; values are per-row pure functions, so
    * the shuffle cannot change results.
    */
  private def spread[T](media: Dataset[T]): Dataset[T] = {
    val target = media.sparkSession.sparkContext.defaultParallelism
    if (media.rdd.getNumPartitions >= target) media
    else media.repartition(target)
  }

  /** Partition-batched decode: one codec context per partition (the real
    * pattern for libjpeg/ffmpeg handles), iterator in / iterator out.
    * Images decode for REAL; audio/video go through the declared stub.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    spread(media).mapPartitions { rows =>
      // real impl: open codec context here, close at iterator end
      rows.map { r =>
        if (r.modality == "image") {
          val (w, h) = ImageCodec.decodeDims(r.content)
          MediaFeatures(r.media_id, r.modality, r.content.length,
            w, h, 1, featureOf(hexDigest(r.content)))
        } else FakeCodec.decode(r)
      }
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
    * partition and seeks); per-frame values are digest-derived so the whole
    * sampling pipeline stays externally checkable.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    spread(media).mapPartitions { rows =>
      // real impl: open demuxer/decoder context here, close at iterator end
      rows.filter(_.modality == "video").flatMap { r =>
        val h = hexDigest(r.content)
        val nFrames = 1 + nib(h, 2)
        (1 to nFrames by stride).iterator.map { i =>
          val fh = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$h:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
          FrameRow(r.media_id, i, (i - 1) * 40, fh.substring(0, 16),
            nib(fh, 16) < 4)
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

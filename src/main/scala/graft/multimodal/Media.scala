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
  * The IMAGE and AUDIO paths are REAL codecs: image rows carry genuine PNG
  * bytes decoded with `javax.imageio` (width/height from decoded pixels),
  * audio rows carry genuine RIFF/WAVE PCM bytes parsed with
  * `javax.sound.sampled` (sample rate, channels, frame count) — both
  * deterministically rendered so the table is reproducible, and in both
  * cases the DuckDB oracle independently re-parses the container header
  * (PNG IHDR / RIFF fmt+data) from the exported blob, so a wrong decode
  * fails the value compare. VIDEO decode remains a STUB ([[FakeCodec]],
  * this container has no video codecs): deterministic pseudo-metadata from
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

  /** REAL audio codec over the JDK's sampled-audio stack: audio rows carry
    * genuine RIFF/WAVE bytes (canonical 44-byte PCM header + deterministic
    * 16-bit samples), and metadata comes from `javax.sound.sampled` parsing
    * the container for real. The DuckDB oracle independently re-parses the
    * RIFF header fields (little-endian sample rate at byte 24, channels at
    * 22, data size at 40) straight from the exported blob's hex — the same
    * independent-reparse contract as the PNG IHDR check.
    */
  object AudioCodec {

    /** The standard consumer/telephony rate ladder. */
    val SampleRates: Array[Int] =
      Array(8000, 11025, 16000, 22050, 24000, 32000, 44100, 48000)

    /** Deterministic 16-bit PCM render + canonical RIFF/WAVE header: the
      * stand-in for genuine ingest bytes. Samples are an LCG stream of the
      * seed, so the encoded bytes — and everything the oracle derives from
      * them — are stable across runs.
      */
    def encodeWav(sampleRate: Int, channels: Int, nFrames: Int,
                  seed: Int): Array[Byte] = {
      val dataSize = nFrames * channels * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      buf.putShort(1) // PCM
      buf.putShort(channels.toShort)
      buf.putInt(sampleRate)
      buf.putInt(sampleRate * channels * 2) // byte rate
      buf.putShort((channels * 2).toShort)  // block align
      buf.putShort(16)                      // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
      var state = seed | 1
      var i = 0
      while (i < nFrames * channels) {
        state = state * 1103515245 + 12345
        buf.putShort((state >>> 16).toShort)
        i += 1
      }
      buf.array()
    }

    /** Decode real WAV bytes → (sampleRate, channels, pcmFrames) via the
      * JDK's audio-file parser (NOT our own header math — that lives only
      * in the oracle, which is the point of the cross-check).
      */
    def decodeMeta(bytes: Array[Byte]): (Int, Int, Long) = {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      (fmt.getSampleRate.toInt, fmt.getChannels, aff.getFrameLength.toLong)
    }
  }

  /** STUB codec for VIDEO only — replace with real JNI/codec bindings
    * in production (this container ships no video codecs). All values are
    * pure functions of [[hexDigest]](content) so the pipeline is
    * deterministic and externally checkable.
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
    * deterministically-rendered PNG bytes and AUDIO rows genuine RIFF/WAVE
    * PCM bytes (dims/rate/seed derived from the doc text digest); video
    * rows carry opaque utf-8 blobs for the declared stub. Encoding runs
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
          val h = hexDigest(r.content)
          r.modality match {
            case "image" =>
              val w = 16 * (1 + nib(h, 0))
              val ht = 16 * (1 + nib(h, 1))
              val seed = Integer.parseInt(h.substring(0, 6), 16)
              r.copy(content = ImageCodec.encodePng(w, ht, seed))
            case "audio" =>
              val sr = AudioCodec.SampleRates(nib(h, 0) % 8)
              val ch = 1 + (nib(h, 1) & 1)
              val frames = 160 * (1 + nib(h, 2)) // 160..2560 PCM frames
              val seed = Integer.parseInt(h.substring(0, 6), 16)
              r.copy(content = AudioCodec.encodeWav(sr, ch, frames, seed))
            case _ => r
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
    * Images and audio decode for REAL (javax.imageio / javax.sound.sampled);
    * video goes through the declared stub. Audio maps onto the shared
    * feature schema as width := sample rate, height := channels,
    * n_frames := PCM frame count (the audio meaning of "frames").
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    spread(media).mapPartitions { rows =>
      // real impl: open codec context here, close at iterator end
      rows.map { r =>
        r.modality match {
          case "image" =>
            val (w, h) = ImageCodec.decodeDims(r.content)
            MediaFeatures(r.media_id, r.modality, r.content.length,
              w, h, 1, featureOf(hexDigest(r.content)))
          case "audio" =>
            val (sr, ch, frames) = AudioCodec.decodeMeta(r.content)
            MediaFeatures(r.media_id, r.modality, r.content.length,
              sr, ch, frames.toInt, featureOf(hexDigest(r.content)))
          case _ => FakeCodec.decode(r)
        }
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
          val fh = new String(hexChars(java.security.MessageDigest
            .getInstance("MD5").digest(s"$h:$i".getBytes("UTF-8")), HexLower))
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

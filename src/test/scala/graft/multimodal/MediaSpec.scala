package graft.multimodal

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** The image path must be a REAL codec: genuine PNG/JPEG bytes in, decoded
  * pixel dimensions out — verified against an independent parse of the
  * container header, not against the encoder's inputs.
  */
class MediaSpec extends AnyFunSuite {

  /** Big-endian IHDR width/height straight from the PNG container (bytes
    * 16-19 / 20-23) — the same independent check the DuckDB oracle runs.
    */
  private def ihdrDims(png: Array[Byte]): (Int, Int) = {
    def be32(off: Int): Int =
      ((png(off) & 0xFF) << 24) | ((png(off + 1) & 0xFF) << 16) |
        ((png(off + 2) & 0xFF) << 8) | (png(off + 3) & 0xFF)
    (be32(16), be32(20))
  }

  test("encodePng emits a genuine PNG whose IHDR and decoded raster agree") {
    val png = Media.ImageCodec.encodePng(300, 77, seed = 0x123456)
    assert(png.take(8).sameElements(
      Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n').map(_.toByte)),
      "PNG signature")
    assert(ihdrDims(png) == (300, 77))
    assert(Media.ImageCodec.decodeDims(png) == (300, 77))
    // deterministic: same inputs → same bytes
    assert(png.sameElements(Media.ImageCodec.encodePng(300, 77, seed = 0x123456)))
  }

  test("decodeDims handles JPEG fixtures too (codec is container-agnostic)") {
    val img = new java.awt.image.BufferedImage(41, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    assert(jpeg.length > 2 && (jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8,
      "JPEG SOI marker")
    assert(Media.ImageCodec.decodeDims(jpeg) == (41, 23))
  }

  /** Little-endian RIFF fields straight from the WAV container — the same
    * independent check the DuckDB oracle runs.
    */
  private def riffMeta(wav: Array[Byte]): (Int, Int, Int) = {
    def le(off: Int, n: Int): Int =
      (0 until n).map(i => (wav(off + i) & 0xFF) << (8 * i)).sum
    val channels = le(22, 2)
    (le(24, 4), channels, le(40, 4) / (2 * channels))
  }

  test("encodeWav emits a genuine WAV that javax.sound.sampled parses back") {
    val wav = Media.AudioCodec.encodeWav(22050, 2, nFrames = 321, seed = 0xBEEF)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(riffMeta(wav) == (22050, 2, 321))
    // the REAL decode path: the JDK's parser, not our header math
    assert(Media.AudioCodec.decodeMeta(wav) == (22050, 2, 321L))
    // deterministic: same inputs → same bytes
    assert(wav.sameElements(
      Media.AudioCodec.encodeWav(22050, 2, nFrames = 321, seed = 0xBEEF)))
  }

  /** Big-endian 16-bit reads at [[Media.VideoCodec]]'s documented fixed
    * offsets — the same independent check the DuckDB oracle runs.
    */
  private def mp4Fixed(mp4: Array[Byte]): (Int, Int, Int, Int, Int) = {
    def be16(off: Int): Int = ((mp4(off) & 0xFF) << 8) | (mp4(off + 1) & 0xFF)
    (be16(232), be16(236), be16(517), be16(537), be16(605)) // w, h, N, S, K
  }

  test("encodeMp4 emits a genuine ISO-BMFF file the box walker demuxes back") {
    val mp4 = Media.VideoCodec.encodeMp4(208, 96, nFrames = 11, gop = 3,
      frameSize = 320, seed = 0xCAFE)
    assert(new String(mp4.slice(4, 8), "US-ASCII") == "ftyp")
    assert(new String(mp4.slice(8, 12), "US-ASCII") == "isom")

    // fixed-offset reparse (the oracle's view) agrees with the inputs
    val (w, h, n, s, k) = mp4Fixed(mp4)
    assert((w, h, n, s) == (208, 96, 11, 320))
    assert(k == 4, "keyframes 1,4,7,10")

    // the REAL decode path: generic box-tree walk + sample-table resolution
    val m = Media.VideoCodec.parseMeta(mp4)
    assert((m.width, m.height, m.nFrames) == (208, 96, 11))
    assert(m.mediaTimescale == 25)
    assert(m.keyframes == Set(1, 4, 7, 10))
    assert(m.sampleSizes.forall(_ == 320))
    // frames tile mdat contiguously from the stco chunk offset
    assert(m.sampleOffsets.head == 615 + 4 * k)
    assert(m.sampleOffsets.toSeq == m.sampleOffsets.indices.map(i => 615L + 4 * k + i * 320L))
    assert(m.sampleOffsets.last + 320 == mp4.length)
    // stts ticks at delta 1 over timescale 25 → 40 ms per frame
    assert(m.sampleTimes.toSeq == (0 until 11).map(_.toLong))
    // deterministic: same inputs → same bytes
    assert(mp4.sameElements(Media.VideoCodec.encodeMp4(208, 96, 11, 3, 320, 0xCAFE)))
  }

  test("parseMeta is layout-agnostic: mdat-first file still demuxes") {
    val mp4 = Media.VideoCodec.encodeMp4(64, 48, nFrames = 5, gop = 2,
      frameSize = 100, seed = 1)
    val ftypEnd = 24
    val moovEnd = mp4.length - (8 + 5 * 100)
    // rebuild as [ftyp][mdat][moov] — a legal ISO-BMFF ordering
    val reordered = mp4.slice(0, ftypEnd) ++ mp4.slice(moovEnd, mp4.length) ++
      mp4.slice(ftypEnd, moovEnd)
    val m = Media.VideoCodec.parseMeta(reordered)
    assert((m.width, m.height, m.nFrames) == (64, 48, 5))
    assert(m.keyframes == Set(1, 3, 5))
  }

  test("extractFeatures decodes image+audio+video rows for real") {
    val spark = GraftSession.get("media-spec")
    import spark.implicits._
    val docs = spark.range(0, 30)
      .select(col("id").as("doc_id"), concat(lit("text body "), col("id")).as("text"))
    val media = Media.mediaTable(spark, docs).cache()
    val feats = Media.extractFeatures(media).collect()

    val rows = media.collect().map(r => r.media_id -> r).toMap
    feats.filter(_.modality == "image").foreach { f =>
      val content = rows(f.media_id).content
      // real decode: dims equal an independent parse of the PNG header
      assert(ihdrDims(content) == (f.width, f.height))
      assert(f.n_frames == 1 && f.n_bytes == content.length)
    }
    assert(feats.count(_.modality == "image") > 0)
    feats.filter(_.modality == "audio").foreach { f =>
      val content = rows(f.media_id).content
      // real decode: metadata equals an independent parse of the RIFF header
      assert(riffMeta(content) == (f.width, f.height, f.n_frames))
      assert(f.height == 1 || f.height == 2)
      assert(f.n_bytes == content.length)
    }
    assert(feats.count(_.modality == "audio") > 0)
    feats.filter(_.modality == "video").foreach { f =>
      val content = rows(f.media_id).content
      // real demux: dims/frames equal an independent fixed-offset parse
      val (w, h, n, _, _) = mp4Fixed(content)
      assert((w, h, n) == (f.width, f.height, f.n_frames))
      assert(f.n_bytes == content.length)
    }
    assert(feats.count(_.modality == "video") > 0)

    // frame sampling digests the ACTUAL mdat byte ranges
    val frames = Media.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { fr =>
      val content = rows(fr.media_id).content
      val m = Media.VideoCodec.parseMeta(content)
      val off = m.sampleOffsets(fr.frame_idx - 1).toInt
      val bytes = java.util.Arrays.copyOfRange(
        content, off, off + m.sampleSizes(fr.frame_idx - 1))
      assert(fr.phash == Media.hexDigest(bytes).substring(0, 16))
      assert(fr.ts_ms == (fr.frame_idx - 1) * 40)
      assert(fr.is_keyframe == m.keyframes.contains(fr.frame_idx))
    }
    media.unpersist()
  }
}

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

  test("encodeMp4 round-trips under 200 random parameter draws") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val w = 16 * (1 + rnd.nextInt(16)); val h = 16 * (1 + rnd.nextInt(16))
      val n = 1 + rnd.nextInt(16); val gop = 1 + rnd.nextInt(4)
      val fs = 64 * (1 + rnd.nextInt(8)); val seed = rnd.nextInt()
      val mp4 = Media.VideoCodec.encodeMp4(w, h, n, gop, fs, seed)
      val m = Media.VideoCodec.parseMeta(mp4)
      val k = (1 to n by gop).size
      assert((m.width, m.height, m.nFrames) == (w, h, n))
      assert(m.keyframes == (1 to n by gop).toSet)
      assert(m.sampleOffsets.head == 615 + 4 * k)
      assert(m.sampleOffsets.last + fs == mp4.length)
      val (fw, fh, fn, fss, fk) = mp4Fixed(mp4)
      assert((fw, fh, fn, fss, fk) == (w, h, n, fs, k))
    }
  }

  /** A multi-chunk, table-stsz, v1-tkhd file our encoder never emits:
    * chunk 1 holds 2 samples at offset 1000, chunk 2 holds 3 at 2000,
    * sizes 10..50, two stts runs, no stss. Exercises the parser's general
    * stsc walk, v1 header widths, and the stss-absent ⇒ all-sync rule.
    */
  private def foreignMp4(): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(357)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    def box(size: Int, tpe: String): Unit = { buf.putInt(size); fourcc(tpe) }
    box(357, "moov")
    box(349, "trak")
    box(104, "tkhd"); buf.putInt(0x01000007)      // version 1
    buf.putLong(0); buf.putLong(0); buf.putInt(1); buf.putInt(0); buf.putLong(5)
    buf.putLong(0); buf.putLong(0)                // reserved + layer..reserved
    for (v <- Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000))
      buf.putInt(v)
    buf.putInt(320 << 16); buf.putInt(240 << 16)
    box(237, "mdia")
    box(32, "mdhd"); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    buf.putInt(30); buf.putInt(5); buf.putShort(0x55C4.toShort); buf.putShort(0)
    box(45, "hdlr"); buf.putInt(0); buf.putInt(0); fourcc("vide")
    buf.putInt(0); buf.putInt(0); buf.putInt(0)
    buf.put("VideoHandler".getBytes("US-ASCII")); buf.put(0.toByte)
    box(152, "minf")
    box(144, "stbl")
    box(32, "stts"); buf.putInt(0); buf.putInt(2)
    buf.putInt(2); buf.putInt(5); buf.putInt(3); buf.putInt(7)
    box(40, "stsz"); buf.putInt(0); buf.putInt(0); buf.putInt(5)
    for (s <- Seq(10, 20, 30, 40, 50)) buf.putInt(s)
    box(40, "stsc"); buf.putInt(0); buf.putInt(2)
    buf.putInt(1); buf.putInt(2); buf.putInt(1)
    buf.putInt(2); buf.putInt(3); buf.putInt(1)
    box(24, "stco"); buf.putInt(0); buf.putInt(2)
    buf.putInt(1000); buf.putInt(2000)
    require(!buf.hasRemaining)
    buf.array()
  }

  test("parseMeta resolves multi-chunk stsc/stco, stsz tables, v1 tkhd") {
    val m = Media.VideoCodec.parseMeta(foreignMp4())
    assert((m.width, m.height, m.nFrames) == (320, 240, 5))
    assert(m.mediaTimescale == 30)
    assert(m.sampleSizes.toSeq == Seq(10, 20, 30, 40, 50))
    assert(m.sampleOffsets.toSeq == Seq(1000L, 1010L, 2000L, 2030L, 2070L))
    assert(m.sampleTimes.toSeq == Seq(0L, 5L, 10L, 17L, 24L))
    assert(m.keyframes == Set(1, 2, 3, 4, 5), "no stss => every sample sync")
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

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

  test("extractFeatures decodes image rows for real; stub covers audio/video") {
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
      val h = Media.hexDigest(rows(f.media_id).content)
      assert(f.width == 16 * (1 + Character.digit(h.charAt(0), 16)))
      assert(f.n_frames == 0)
    }
    media.unpersist()
  }
}

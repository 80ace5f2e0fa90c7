package graft.cawd

import java.io.ByteArrayInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.{PageType, Util}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.format.converter.ParquetMetadataConverter

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Structural Parquet chunker — page-level chunks computed from PUBLIC
  * parquet-hadoop/parquet-format APIs (footer via `ParquetFileReader`, page
  * boundaries via `Util.readPageHeader` over the raw column-chunk bytes).
  *
  * The reference needed a forked parquet-mr to do this
  * (`parquet/dedup/NaiveParquetChunkingAlgorithm.java:39-129`, fork-only
  * symbols at `:109,:117`; README.md:5-23). We slice original file bytes
  * instead of re-serializing headers/footers, which is strictly safer for
  * byte-identity (SURVEY.md §7.4 hard part 1).
  *
  * Regions not claimed by header/page/footer chunks (column indexes, bloom
  * filters, padding) are emitted as `Regular` chunks so the chunk list is
  * contiguous over [0, fileLen) and reconstruction is plain concatenation.
  */
object ParquetChunker {

  def chunk(pathStr: String, fileRank: Int,
            withContent: Boolean = true): Seq[FileChunk] = {
    val conf = new Configuration()
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    val fileLen = fs.getFileStatus(path).getLen
    val bytes = new Array[Byte](fileLen.toInt)
    val in = fs.open(path)
    try in.readFully(0, bytes) finally in.close()

    val footer = ParquetFileReader.readFooter(conf, path,
      ParquetMetadataConverter.NO_FILTER)

    val metas = ArrayBuffer.empty[(String, Long, Long, Int, String)]
    def add(t: String, start: Long, size: Long, colId: Int = -1,
            colType: String = ""): Unit =
      if (size > 0) metas += ((t, start, size, colId, colType))

    add(ChunkType.Magic, 0L, 4L) // "PAR1"

    footer.getBlocks.asScala.foreach { block =>
      block.getColumns.asScala.zipWithIndex.foreach { case (cc, colId) =>
        val colType = cc.getPrimitiveType.getPrimitiveTypeName.name
        var pos = cc.getStartingPos
        val end = cc.getStartingPos + cc.getTotalSize
        while (pos < end) {
          // Count the header's byte length by re-reading it from a bounded
          // window: thrift-compact headers are self-delimiting.
          val window = new ByteArrayInputStream(
            bytes, pos.toInt, math.min(end - pos, 1 << 16).toInt)
          val before = window.available()
          val header = Util.readPageHeader(window)
          val headerLen = before - window.available()
          add(ChunkType.PageHeader, pos, headerLen, colId, colType)
          val bodyType = header.getType match {
            case PageType.DICTIONARY_PAGE => ChunkType.DictPage
            case PageType.DATA_PAGE       => ChunkType.DataPageV1
            case PageType.DATA_PAGE_V2    => ChunkType.DataPageV2
            case PageType.INDEX_PAGE      => ChunkType.IndexPage
            case _                        => ChunkType.Regular
          }
          add(bodyType, pos + headerLen, header.getCompressed_page_size.toLong,
            colId, colType)
          pos += headerLen + header.getCompressed_page_size
        }
      }
    }

    // File tail: 4-byte footer length + "PAR1" magic; the serialized footer
    // sits immediately before it.
    val afterFooterStart = fileLen - 8
    val footerLenLE = java.nio.ByteBuffer.wrap(bytes, afterFooterStart.toInt, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    add(ChunkType.ParquetFooter, afterFooterStart - footerLenLE, footerLenLE.toLong)
    add(ChunkType.AfterFooter, afterFooterStart, 8L)

    // Fill uncovered regions (column/offset indexes, padding) as Regular.
    val sorted = metas.sortBy(_._2)
    val full = ArrayBuffer.empty[(String, Long, Long, Int, String)]
    var cursor = 0L
    sorted.foreach { m =>
      if (m._2 > cursor) full += ((ChunkType.Regular, cursor, m._2 - cursor, -1, ""))
      full += m
      cursor = m._2 + m._3
    }
    if (cursor < fileLen) full += ((ChunkType.Regular, cursor, fileLen - cursor, -1, ""))

    full.toSeq.zipWithIndex.map { case ((t, start, size, colId, colType), seq) =>
      val sig = Sha1.of(bytes, start.toInt, size.toInt)
      val content =
        if (withContent) java.util.Arrays.copyOfRange(bytes, start.toInt, (start + size).toInt)
        else Array.emptyByteArray
      FileChunk(pathStr, fileRank, seq, t, start, size, colId, colType, -1, sig, content)
    }
  }
}

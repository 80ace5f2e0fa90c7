package graft.cawd

import java.io.ByteArrayInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.{PageType, Util}
import org.apache.parquet.hadoop.ParquetFileReader

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Structural Parquet chunker — page-level chunks computed from PUBLIC
  * parquet-hadoop/parquet-format APIs (footer via `ParquetFileReader`, page
  * boundaries via `Util.readPageHeader` over bounded windows of the raw
  * column-chunk bytes).
  *
  * The reference needed a forked parquet-mr to do this
  * (`parquet/dedup/NaiveParquetChunkingAlgorithm.java:39-129`, fork-only
  * symbols at `:109,:117`; README.md:5-23). We slice original file bytes
  * instead of re-serializing headers/footers, which is strictly safer for
  * byte-identity (SURVEY.md §7.4 hard part 1).
  *
  * Memory is bounded: the planning pass reads the footer plus one small
  * window per page header (thrift-compact headers are self-delimiting);
  * hashing streams through [[RegionHash]]. No whole-file buffer, no Int
  * offsets — multi-GiB files are fine.
  *
  * Regions not claimed by header/page/footer chunks (column indexes, bloom
  * filters, padding) are emitted as `Regular` chunks so the chunk list is
  * contiguous over [0, fileLen) and reconstruction is plain concatenation.
  */
object ParquetChunker {

  def chunk(pathStr: String, fileRank: Int,
            withContent: Boolean = true): Seq[FileChunk] =
    RegionHash.hashChunks(pathStr, plan(pathStr, fileRank), withContent)

  /** Metadata-only pass: footer + per-page-header bounded reads. Returned
    * chunks carry offsets/sizes with empty signatures.
    */
  def plan(pathStr: String, fileRank: Int): Seq[FileChunk] = {
    val conf = new Configuration()
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    val fileLen = fs.getFileStatus(path).getLen

    val footer = {
      val reader = ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf))
      try reader.getFooter finally reader.close()
    }

    val metas = ArrayBuffer.empty[(String, Long, Long, Int, String)]
    def add(t: String, start: Long, size: Long, colId: Int = -1,
            colType: String = ""): Unit =
      if (size > 0) metas += ((t, start, size, colId, colType))

    add(ChunkType.Magic, 0L, 4L) // "PAR1"

    val in = fs.open(path)
    try {
      // Parse one page header from a bounded window at `pos`; grow the
      // window if the header happens to straddle it (headers are tens of
      // bytes; 64 KiB succeeds in practice on the first try).
      def readHeaderAt(pos: Long, end: Long): (org.apache.parquet.format.PageHeader, Int) = {
        val MaxWindow = 1 << 24 // a sane page header is tens of bytes
        var window = 1 << 16
        while (true) {
          val len = math.min(window.toLong, end - pos).toInt
          val buf = new Array[Byte](len)
          in.readFully(pos, buf, 0, len)
          val bis = new ByteArrayInputStream(buf)
          val before = bis.available()
          try {
            val h = Util.readPageHeader(bis)
            return (h, before - bis.available())
          } catch {
            case _: Exception if len < (end - pos) && window < MaxWindow =>
              window *= 4 // header straddled the window; retry larger
            case e: Exception =>
              // corrupt/lying footer — fail fast so planFile degrades the
              // whole file to one ERROR chunk instead of looping
              throw new IllegalStateException(
                s"unparseable page header at $pos (window $len)", e)
          }
        }
        throw new IllegalStateException("unreachable")
      }

      footer.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.zipWithIndex.foreach { case (cc, colId) =>
          val colType = cc.getPrimitiveType.getPrimitiveTypeName.name
          var pos = cc.getStartingPos
          val end = cc.getStartingPos + cc.getTotalSize
          while (pos < end) {
            val (header, headerLen) = readHeaderAt(pos, end)
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
      val tail = new Array[Byte](4)
      in.readFully(afterFooterStart, tail, 0, 4)
      val footerLenLE = java.nio.ByteBuffer.wrap(tail)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      add(ChunkType.ParquetFooter, afterFooterStart - footerLenLE, footerLenLE.toLong)
      add(ChunkType.AfterFooter, afterFooterStart, 8L)
    } finally in.close()

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
      FileChunk(pathStr, fileRank, seq, t, start, size, colId, colType, -1,
        Array.emptyByteArray, Array.emptyByteArray)
    }
  }
}

package graft.cawd

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end batch pipelines: directory scan → structural chunking →
  * signature dedup → transfer stats / reconstruction.
  *
  * Mirrors the reference's client/server flow (SURVEY.md §3) as ONE
  * declarative plan: the sorted-directory file stream
  * (`net/SpeedupClient.java:93-123`), per-file `eagerChunking`, the
  * server-side store probe/insert, and the final stats aggregation. The TCP
  * conversation disappears; its byte cost survives as the accounting model
  * in [[Stats.fromStatus]].
  *
  * Scale notes (100 TB target):
  *   - chunking is embarrassingly parallel per file — a flatMap over a
  *     file-path Dataset, no shuffle;
  *   - the dedup decision is one hash aggregation + co-partitioned join on
  *     `signature` ([[Dedup.markFirstOccurrence]]); at high dup ratios the
  *     map-side combine shrinks the shuffle to ~one row per distinct
  *     signature;
  *   - `withContent=false` keeps only offsets+hashes in flight (20 B per
  *     chunk instead of the chunk bytes) — the at-scale mode; content is
  *     re-read by offset only where a sink needs it.
  */
object CawdEngine {

  sealed trait Format
  case object Orc     extends Format
  case object Parquet extends Format

  /** S5/O1: list files under `dir` with `suffix`, lexicographically sorted —
    * order defines store-warming semantics (`SpeedupClient.java:102`).
    */
  def listFiles(dir: String, suffix: String): Seq[(String, Int)] = {
    val conf = new Configuration()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
      .filter(_.endsWith(suffix)).sorted
    files.zipWithIndex.toSeq
  }

  /** Chunk a set of (path, fileRank) files into a Dataset[FileChunk].
    * Distributed flatMap: each task chunks whole files independently.
    */
  def chunkFiles(spark: SparkSession, files: Seq[(String, Int)], fmt: Format,
                 orcMode: OrcChunker.Mode = OrcChunker.StripeColumn,
                 withContent: Boolean = false): Dataset[FileChunk] = {
    import spark.implicits._
    val n = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(files).repartition(n).flatMap { case (path, rank) =>
      fmt match {
        case Orc     => OrcChunker.chunk(path, rank, orcMode, withContent)
        case Parquet => ParquetChunker.chunk(path, rank, withContent)
      }
    }
  }

  /** Simulate the README's warm-store experiment (BASELINE.md parity KPI):
    * every input file is followed by a byte-identical copy (fileRank shifted
    * past all originals, so all copies arrive "after" all originals).
    */
  def withDuplicates(chunks: Dataset[FileChunk]): Dataset[FileChunk] = {
    import chunks.sparkSession.implicits._
    val shift = 1 << 20
    chunks.union(chunks.map(c =>
      c.copy(file = c.file + "+copy", fileRank = c.fileRank + shift)))
  }

  /** Full naive/column pipeline on parquet or ORC inputs: chunk → flat dedup
    * → per-file + global stat rollup.
    */
  def flatDedupStats(spark: SparkSession, dir: String, fmt: Format,
                     duplicate: Boolean = false,
                     orcMode: OrcChunker.Mode = OrcChunker.Naive,
                     smallThreshold: Long = 0L): DataFrame = {
    val (suffix, dedupable) = fmt match {
      case Parquet => (".parquet", ChunkType.parquetDedupable)
      case Orc => (".orc", orcMode match {
        case OrcChunker.Naive => ChunkType.naiveOrcDedupable
        case _                => ChunkType.columnOrcDedupable
      })
    }
    val base = chunkFiles(spark, listFiles(dir, suffix), fmt, orcMode)
    val chunks = if (duplicate) withDuplicates(base) else base
    val status = Dedup.flatStatus(chunks.toDF(), dedupable, smallThreshold)
    Stats.rollup(Stats.fromStatus(status))
  }

  /** Hierarchical s+p pipeline on ORC inputs (SURVEY.md §2.4 J5). */
  def hierarchicalDedupStats(spark: SparkSession, dir: String,
                             duplicate: Boolean = false): DataFrame = {
    val base = chunkFiles(spark, listFiles(dir, ".orc"), Orc, OrcChunker.StripeColumn)
    val chunks = if (duplicate) withDuplicates(base) else base
    val status = Dedup.hierarchicalStatus(chunks.toDF())
    Stats.rollup(Stats.fromStatus(status))
  }

  /** S7: reconstruction check — ordered concatenation of top-level chunk
    * contents must be byte-identical to the source file. Returns one row per
    * file: (file, file_bytes, recon_bytes, identical).
    *
    * Shuffles only (file, seq, content) and verifies with a streaming SHA-1
    * per group — no whole-file buffer on the reduce side.
    */
  def reconstructionCheck(chunks: Dataset[FileChunk]): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .filter(c => c.parentSeq == -1 || c.chunkType == ChunkType.StripeIndex ||
        c.chunkType == ChunkType.StripeFooter)
      .filter(c => c.chunkType != ChunkType.Column)
      .groupByKey(_.file)
      .mapGroups { (file, it) =>
        val md = java.security.MessageDigest.getInstance("SHA-1")
        var reconBytes = 0L
        it.toSeq.sortBy(_.seq).foreach { c =>
          md.update(c.content); reconBytes += c.content.length
        }
        val reconSha = md.digest().map("%02x".format(_)).mkString

        val conf = new Configuration()
        val p = new Path(file)
        val fs = p.getFileSystem(conf)
        val len = fs.getFileStatus(p).getLen
        val buf = new Array[Byte](1 << 20)
        val md2 = java.security.MessageDigest.getInstance("SHA-1")
        val in = fs.open(p)
        try {
          var n = in.read(buf)
          while (n > 0) { md2.update(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        val origSha = md2.digest().map("%02x".format(_)).mkString
        (file, len, reconBytes, origSha == reconSha)
      }
      .toDF("file", "file_bytes", "recon_bytes", "identical")
  }
}

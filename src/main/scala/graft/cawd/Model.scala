package graft.cawd

import java.security.MessageDigest

/** Data model of the columnar-aware dedup engine.
  *
  * The reference (castuardo/columnar-aware-dedup) models a chunk as an
  * offset+size region of a columnar file identified by a SHA-1 signature
  * (`src/main/java/vmware/speedup/cawd/dedup/ChunkingAlgorithm.java:15-35`).
  * We carry the same identity plus the lineage needed to run the whole
  * pipeline as a declarative Spark plan: `fileRank` preserves arrival order
  * (the reference sorts its work list, `net/SpeedupClient.java:102`), `seq`
  * preserves in-file chunk order (reconstruction is ordered concatenation),
  * and `parentSeq` links a per-column subchunk to its stripe for the
  * hierarchical stripe→column cascade
  * (`orc/dedup/StripePlusColumnORCChunkingAlgorithm.java:199,261-263`).
  */
case class FileChunk(
    file: String,
    fileRank: Int,
    seq: Int,
    chunkType: String,
    start: Long,
    size: Long,
    colId: Int,          // ORC/Parquet column id; -1 for non-column chunks
    colType: String,     // logical type name of the column; "" otherwise
    parentSeq: Int,      // seq of the enclosing stripe chunk; -1 if top-level
    signature: Array[Byte], // SHA-1 of content (20 bytes)
    content: Array[Byte])   // raw bytes; empty in hash-only (at-scale) mode

/** Chunk type vocabulary — union of the reference's four vocabularies
  * (SURVEY.md §1.2) with the offset defects fixed: every file is covered by
  * contiguous chunks starting at 0, so reconstruction is plain ordered
  * concatenation.
  */
object ChunkType {
  // ORC (orc/dedup/*ChunkingAlgorithm.java)
  val Magic        = "Magic"        // leading file magic ("ORC" / "PAR1")
  val StripeIndex  = "StripeIndex"
  val StripeData   = "StripeData"
  val StripeFooter = "StripeFooter"
  val Column       = "Column"       // one column's data region within a stripe
  val FileFooter   = "FileFooter"   // ORC file tail (metadata+footer+postscript)
  // Parquet (parquet/dedup/NaiveParquetChunkingAlgorithm.java:133-145)
  val PageHeader    = "PageHeader"
  val DictPage      = "DictPage"
  val DataPageV1    = "DataPageV1"
  val DataPageV2    = "DataPageV2"
  val IndexPage     = "IndexPage"
  val ParquetFooter = "ParquetFooter"
  val AfterFooter   = "AfterFooter" // trailing 4-byte footer length + magic
  // Anything not structurally interesting (padding, column/offset indexes…)
  val Regular = "Regular"
  // Content-defined chunk (gear/FastCDC baseline, [[graft.cawd.CdcChunker]])
  val CdcChunk = "CdcChunk"

  /** Structural parse failure: the file is readable but not valid
    * ORC/Parquet (reference `ChunkType.ERROR`, e.g.
    * `orc/dedup/NaiveORCChunkingAlgorithm.java:54-59`). The whole file
    * becomes one raw chunk — it still transfers, reconstructs, and counts
    * in stats; one corrupt file must never fail a 100 TB job.
    */
  val Error = "ERROR"

  /** Timing side-channel rows emitted by [[CawdEngine.chunkFiles]]
    * (`parentSeq == -2`, size = elapsed ms): per-file plan-pass duration →
    * `ParsingOverhead` and per-bucket hash-stage duration → `TransferTime`
    * (ref `orc/net/NaiveORCStreamer.java:117-121,149-151`). Excluded from
    * dedup, the chunk-table export, and every oracle-checked output —
    * timings are inherently nondeterministic.
    */
  val PlanStat = "PlanStat"
  val HashStat = "HashStat"

  /** Dedup-eligible chunk types per pipeline variant, mirroring the
    * reference's "special" vs "regular" dispatch (SURVEY.md §2.2 P2):
    * naive ORC dedups stripe data + file footer
    * (`orc/net/NaiveORCStreamer.java:124-141`); the column variants dedup
    * per-column regions + footer; parquet dedups data pages.
    */
  val naiveOrcDedupable: Set[String]   = Set(StripeData, FileFooter)
  val columnOrcDedupable: Set[String]  = Set(Column, FileFooter)
  val parquetDedupable: Set[String]    = Set(DictPage, DataPageV1, DataPageV2)
  val cdcDedupable: Set[String]        = Set(CdcChunk)
}

object Sha1 {
  val Size = 20 // bytes (dedup/ChunkingAlgorithm.java:13)
  def of(bytes: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(bytes, off, len)
    md.digest()
  }
  def of(bytes: Array[Byte]): Array[Byte] = of(bytes, 0, bytes.length)
}

/** One metric observation, the engine's stats row
  * (`common/TransferStats.java:84-158`).
  */
case class StatValue(file: String, metric: String, value: Double, unit: String)

/** The reference's 21 metric types + 3 units (TransferStats.java:86-114).
  * `DoubleColumnHit/DoubleColumnMiss/DoubleColumnMissBytes` are declared by
  * the reference but never emitted anywhere (only the String typed-miss pair
  * is, `orc/net/StripePlusColumnORCStreamer.java:180-184`) — kept here for
  * vocabulary completeness, not emitted, matching the reference.
  */
object Metric {
  val FileBytes            = "FileBytes"
  val TransferBytes        = "TransferBytes"
  val TotalBytes           = "TotalBytes"
  val TransferTime         = "TransferTime"
  val ExtraTransferBytes   = "ExtraTransferBytes"
  val DedupBytes           = "DedupBytes"
  val ParsingOverhead      = "ParsingOverhead"
  val StripeHit            = "StripeHit"
  val StripeMiss           = "StripeMiss"
  val ColumnHit            = "ColumnHit"
  val ColumnMiss           = "ColumnMiss"
  val DoubleColumnHit      = "DoubleColumnHit"
  val DoubleColumnMiss     = "DoubleColumnMiss"
  val DoubleColumnMissBytes = "DoubleColumnMissBytes"
  val StringColumnMiss     = "StringColumnMiss"
  val StringColumnMissBytes = "StringColumnMissBytes"
  val FooterHit            = "FooterHit"
  val FooterMiss           = "FooterMiss"
  val SmallColumn          = "SmallColumn"
  val StripeSize           = "StripeSize"
  val FooterSize           = "FooterSize"

  val Bytes        = "Bytes"
  val Milliseconds = "Milliseconds"
  val Count        = "Count"
}

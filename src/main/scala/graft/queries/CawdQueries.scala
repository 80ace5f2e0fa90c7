package graft.queries

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cawd._

/** Columnar-aware-dedup query pack — the reference's core capability
  * (SURVEY.md §2.1-§2.8) run end-to-end on the driver corpus's parquet
  * files and on ORC copies of its tables.
  *
  * Correctness model: the byte-level chunkers are unit/property-tested
  * (CawdSpec); everything downstream of the chunk table — first-occurrence
  * dedup, hierarchical cascade, wire/byte accounting, two-level stats
  * rollup — is pure relational algebra. Each query therefore materializes
  * its chunk table as parquet ([[graft.cawd.CawdExport]]) and carries a
  * DuckDB `oracleSql` that RE-DERIVES the dedup decision and the stats
  * rollup from that table independently, so the driver hash-compares
  * values, not just row counts. Only c06 (byte-identity reconstruction) is
  * inherently byte-level and stays rows-only + unit-tested.
  */
object CawdQueries {

  /** Fixed root (like [[CawdExport.Root]], not `java.io.tmpdir`): the c06
    * oracle's `read_blob` must name the same absolute path the fixtures
    * are written to.
    */
  val OrcFixtureRoot = "/tmp/graft-orc-fixtures"

  /** Deterministic ORC fixtures: testdata tables re-written as single ORC
    * files under [[OrcFixtureRoot]] (one dir per sf). Sorted
    * single-partition writes → byte-stable files per round.
    */
  def ensureOrcFixtures(spark: SparkSession, sfDir: String): String = {
    val sfName = sfDir.replaceAll(".*/", "")
    val outDir = s"$OrcFixtureRoot/$sfName"
    val conf = new Configuration()
    val out = new Path(outDir)
    val fs = out.getFileSystem(conf)
    val tables = Seq("nation" -> "n_nationkey", "region" -> "r_regionkey",
      "supplier" -> "s_suppkey", "customer" -> "c_custkey")
    val missing = tables.filter { case (t, _) => !fs.exists(new Path(outDir, s"$t.orc")) }
    missing.foreach { case (t, key) =>
      val tmp = new Path(outDir, s"_tmp_$t")
      spark.read.parquet(s"$sfDir/$t.parquet")
        .orderBy(col(key)).coalesce(1)
        .write.mode("overwrite").orc(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".orc"))
        .getOrElse(sys.error(s"no orc part file written for $t"))
      fs.rename(part, new Path(outDir, s"$t.orc"))
      fs.delete(tmp, true)
    }
    outDir
  }

  private def base(c: org.apache.spark.sql.Column) =
    regexp_replace(c, ".*/", "")

  /** Chunk → export → dedup-from-export → stats. Both this plan and the
    * DuckDB oracle consume the SAME materialized chunk table, so the dedup
    * decision + accounting get a value-level external check (and chunking
    * runs once instead of per consumer).
    */
  private def flatFromExport(s: SparkSession, sfDir: String, srcDir: String,
                             fmt: CawdEngine.Format, tag: String,
                             duplicate: Boolean, orcMode: OrcChunker.Mode,
                             smallThreshold: Long,
                             dedupable: Set[String]): DataFrame = {
    val suffix = fmt match {
      case CawdEngine.Parquet => ".parquet"
      case CawdEngine.Orc     => ".orc"
    }
    val chunked = CawdEngine.chunkFiles(s, CawdEngine.listFiles(srcDir, suffix), fmt, orcMode)
    val chunks = if (duplicate) CawdEngine.withDuplicates(chunked) else chunked
    val tbl = CawdExport.materialize(s, sfDir, tag, chunks)
    val status = Dedup.flatStatus(tbl, dedupable, smallThreshold)
    Stats.rollup(Stats.fromStatus(status)).orderBy("file", "metric")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S4: structural parquet chunk table over every corpus parquet file,
    // read through the `graft-chunks` DataSource V2 provider — the DSv2
    // path (partition planning, pruning, hashing reader) is what the
    // oracle verifies here.
    "c01_parquet_chunk_table" -> ((s, d) => {
      val chunks = s.read.format("graft-chunks").load(d)
      CawdExport.materializeChunkDf(s, d, "c01", chunks)
        .groupBy(col("file"), col("chunkType"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("size")).as("bytes"))
        .orderBy("file", "chunkType")
    }),

    // S4+J1+A1-A4: parquet pipeline, cold store (every first-occurrence
    // chunk misses; intra-corpus duplicate pages dedup).
    "c02_parquet_dedup_cold" -> ((s, d) =>
      flatFromExport(s, d, d, CawdEngine.Parquet, "c02", duplicate = false,
        OrcChunker.Naive, 0L, ChunkType.parquetDedupable)),

    // Warm-store parity KPI (BASELINE.md): file + byte-identical copy →
    // copies' DedupBytes ≈ dedupable section bytes.
    "c03_parquet_dedup_warm" -> ((s, d) =>
      flatFromExport(s, d, d, CawdEngine.Parquet, "c03", duplicate = true,
        OrcChunker.Naive, 0L, ChunkType.parquetDedupable)),

    // S1+J1: naive ORC stripe dedup, warm.
    "c04_orc_naive_dedup_warm" -> ((s, d) =>
      flatFromExport(s, d, ensureOrcFixtures(s, d), CawdEngine.Orc, "c04",
        duplicate = true, OrcChunker.Naive, 0L, ChunkType.naiveOrcDedupable)),

    // S2+P3: column-based ORC dedup with the reference's 50 B small-column
    // bypass (`orc/net/ColumnBasedORCStreamer.java:109`), warm.
    "c08_orc_column_dedup_warm" -> ((s, d) =>
      flatFromExport(s, d, ensureOrcFixtures(s, d), CawdEngine.Orc, "c08",
        duplicate = true, OrcChunker.ColumnBased, 50L, ChunkType.columnOrcDedupable)),

    // S3+J3-J5: hierarchical stripe→column cascade, warm.
    "c05_orc_sp_cascade_warm" -> ((s, d) => {
      val orcDir = ensureOrcFixtures(s, d)
      val chunked = CawdEngine.chunkFiles(s, CawdEngine.listFiles(orcDir, ".orc"),
        CawdEngine.Orc, OrcChunker.StripeColumn)
      val tbl = CawdExport.materialize(s, d, "c05", CawdEngine.withDuplicates(chunked))
      val status = Dedup.hierarchicalStatus(tbl)
      Stats.rollup(Stats.fromStatus(status, emitSizes = true)).orderBy("file", "metric")
    }),

    // S7: byte-identity reconstruction over both formats. The cover-filtered
    // chunk contents are materialized, the streaming SHA-1 digest consumes
    // the EXPORT, and the DuckDB oracle re-verifies every chunk's bytes
    // against `read_blob` slices of the original files at the cumulative
    // offset — an independent byte-level check of the same relation.
    "c06_reconstruction" -> ((s, d) => {
      val orcDir = ensureOrcFixtures(s, d)
      val orc = CawdEngine.chunkFiles(s, CawdEngine.listFiles(orcDir, ".orc"),
        CawdEngine.Orc, OrcChunker.StripeColumn, withContent = true)
      val pq = CawdEngine.chunkFiles(s, CawdEngine.listFiles(d, ".parquet"),
        CawdEngine.Parquet, withContent = true)
      val cover = orc.unionByName(pq)
        // top-level cover rule (see reconstructTo): no timing rows, no
        // StripeColumn overlay columns. `start` rides along for the fused
        // digest's byte-range partials; neither export shape writes it.
        .filter(c => c.parentSeq != -2 &&
          !(c.chunkType == ChunkType.Column && c.parentSeq != -1))
        .select(col("file"), col("seq"), col("start"), col("size"),
          col("content"))
      // The export is written UNCOMPRESSED with 16 MB row groups: its
      // content column is raw slices of ALREADY-compressed parquet/orc
      // file bytes, so codec compression gains ~nothing — and it is the
      // direct cause of the 8 GB-heap OOM the round-11 verdict flagged:
      // parquet's codec (de)compressors allocate DIRECT ByteBuffers sized
      // to the page, blob pages balloon past the writer's row-count page
      // check to tens of MB, and the pooled per-thread buffers across 32
      // concurrent scan tasks exhaust MaxDirectMemorySize (= heap size by
      // default; measured at the 1000× corpus: 31-93 MB reservations
      // failing at the 8.59 GB limit). No codec → no direct buffers; the
      // 16 MB row groups bound any remaining per-chunk buffering and give
      // the ~15 GB single-table scan honest 32 MB splits.
      val exportOpts = Map(
        "compression" -> "uncompressed",
        "parquet.block.size" -> (16L * 1024 * 1024).toString)
      // Fused shape (round 16, default): digest the cover content AS the
      // export is written (per-run partial digests to a sidecar, content
      // never crosses an exchange), then verify each partial against the
      // original file's byte range — CawdEngine.digestingExportWrite
      // scaladoc has the full argument; the old four-pass shape stays
      // runnable via -Dgraft.c06.fused=0 (the CostCenterProbe comparison
      // arm). The DuckDB oracle independently verifies the export's bytes
      // against read_blob slices of the originals either way.
      if (!sys.props.get("graft.c06.fused").contains("0")) {
        val out = CawdExport.dir(d, "c06")
        CawdExport.materializeVia(d, "c06",
          CawdEngine.digestingExportWrite(cover, _, exportOpts))
        CawdEngine.identityFromDigests(s, out)
          .withColumn("file", base(col("file")))
          .orderBy("file")
      } else {
      CawdExport.materializeDf(s, d, "c06", cover.drop("start"), exportOpts)
      // Reassembly runs on a memory-bounded child session (same incident):
      // (a) the vectorized reader sizes batches by ROW COUNT, so the
      // session's 1024-row blob batches can transiently hold ~1 GB per scan
      // task — 16 rows caps a worst-case 16 MB-chunk batch at ~256 MB;
      // (b) the digest's repartition(file) sort ran 32-way, each reduce task
      // externally sorting MB-wide rows — 8 partitions bounds concurrent
      // sort memory at the cost of nothing (the stage is I/O-bound and the
      // file count per corpus is small). On a real cluster the same knobs
      // are per-job scan/shuffle sizing, not session-wide constants.
      val c = graft.GraftSession.child(s, "c06-reassembly",
        shufflePartitions = Some(8))
      c.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16")
      val tbl = c.read.parquet(CawdExport.dir(d, "c06"))
      CawdEngine.reconstructionCheckRows(tbl)
        .withColumn("file", base(col("file")))
        .orderBy("file")
      }
    }),

    // Content-defined chunking baseline (gear/FastCDC, [[CdcChunker]]):
    // the dedup literature's alternative to structural chunking, on the
    // same corpus + byte-identical copies. Compare its DedupBytes with
    // c03's to see what format awareness buys (the reference's thesis).
    "c09_cdc_dedup_warm" -> ((s, d) => {
      val chunked = CdcChunker.chunkFiles(s, CawdEngine.listFiles(d, ".parquet"))
      val tbl = CawdExport.materialize(s, d, "c09",
        CawdEngine.withDuplicates(chunked))
      val status = Dedup.flatStatus(tbl, ChunkType.cdcDedupable, 0L)
      Stats.rollup(Stats.fromStatus(status)).orderBy("file", "metric")
    }),

    // S6: plain no-dedup baseline — REAL fixed-4096 B framing of the byte
    // stream (`net/SpeedupStreamer.java:50-134`): Spark aggregates the
    // actual frame table, while the oracle re-derives the same numbers
    // from the materialized (file, bytes) listing via ceil math — they
    // agree iff the framing is correct.
    "c07_plain_baseline" -> ((s, d) => {
      import s.implicits._
      val files = CawdEngine.listFiles(d, ".parquet")
      val sizes = files.map { case (f, _) =>
        val p = new Path(f)
        val fs = p.getFileSystem(new Configuration())
        (p.getName, fs.getFileStatus(p).getLen)
      }
      CawdExport.materializeDf(s, d, "c07",
        s.createDataset(sizes).toDF("file", "bytes"))
      CawdEngine.plainFrames(s, files).toDF()
        .groupBy(base(col("file")).as("file"))
        .agg(sum(col("size")).as("transfer_bytes"), count(lit(1)).as("frames"))
        .withColumn("extra_bytes", (length(col("file")) + 12).cast("long"))
        .orderBy("file")
    })
  )

  import CawdOracleSql._

  val oracle: Map[String, String] = Map(
    "c01_parquet_chunk_table" ->
      s"""SELECT file, chunkType, count(*) AS n_chunks,
         |  CAST(sum(size) AS BIGINT) AS bytes
         |FROM read_parquet('${exportGlob("c01")}')
         |GROUP BY file, chunkType""".stripMargin,
    "c02_parquet_dedup_cold" -> flatSql("c02", ChunkType.parquetDedupable, 0L),
    "c03_parquet_dedup_warm" -> flatSql("c03", ChunkType.parquetDedupable, 0L),
    "c04_orc_naive_dedup_warm" -> flatSql("c04", ChunkType.naiveOrcDedupable, 0L),
    "c08_orc_column_dedup_warm" -> flatSql("c08", ChunkType.columnOrcDedupable, 50L),
    "c05_orc_sp_cascade_warm" -> hierarchicalSql("c05"),
    "c09_cdc_dedup_warm" -> flatSql("c09", ChunkType.cdcDedupable, 0L),
    "c07_plain_baseline" ->
      s"""SELECT file, bytes AS transfer_bytes,
         |  CAST(ceil(bytes / 4096.0) AS BIGINT) AS frames,
         |  CAST(length(file) + 12 AS BIGINT) AS extra_bytes
         |FROM read_parquet('${exportGlob("c07")}')""".stripMargin,

    // Byte-identity reconstruction, re-verified from outside the engine:
    // every exported chunk's bytes must equal the original file's bytes at
    // that chunk's cumulative offset (hex-compare — DuckDB 1.0 can slice
    // VARCHAR but not BLOB), and the chunk sizes must sum to the file size.
    // Equivalent to the Spark side's streaming-SHA1(concat) == SHA1(file).
    "c06_reconstruction" ->
      s"""WITH c AS (
         |  SELECT regexp_replace(file, '^file:', '') AS path, seq, size, content
         |  FROM read_parquet('${exportGlob("c06")}')),
         |off AS (
         |  SELECT path, size, content,
         |    sum(size) OVER (PARTITION BY path ORDER BY seq
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - size AS cumoff
         |  FROM c),
         |orig AS (
         |  SELECT filename, hex(content) AS h, size AS fsize
         |  FROM read_blob(['/root/testdata/sf0.01/*.parquet',
         |                  '${CawdQueries.OrcFixtureRoot}/sf0.01/*.orc'])),
         |chk AS (
         |  SELECT o.path, g.fsize, o.size,
         |    substring(g.h, CAST(o.cumoff * 2 + 1 AS BIGINT),
         |              CAST(o.size * 2 AS BIGINT)) = hex(o.content) AS ok
         |  FROM off o JOIN orig g ON o.path = g.filename)
         |SELECT regexp_replace(path, '.*/', '') AS file,
         |  CAST(max(fsize) AS BIGINT) AS file_bytes,
         |  CAST(sum(size) AS BIGINT) AS recon_bytes,
         |  (bool_and(ok) AND CAST(max(fsize) AS BIGINT) = CAST(sum(size) AS BIGINT))
         |    AS identical
         |FROM chk GROUP BY 1""".stripMargin
  )
}

/** DuckDB SQL that re-derives the dedup decision + stats rollup from the
  * chunk tables materialized by [[graft.cawd.CawdExport]]. Correctness
  * always runs at sf0.01 (driver contract), so export paths are pinned to
  * that scale factor. Shared with [[StreamingQueries]] (s01's cross-batch
  * variant).
  */
private[queries] object CawdOracleSql {

  def exportGlob(tag: String): String =
    s"${CawdExport.Root}/sf0.01/$tag/*.parquet"

  /** Shared tail: status(file, chunkType, size, parentSeq, status) →
    * per-file byte metrics + probe counters → two-level rollup, mirroring
    * [[graft.cawd.Stats]] exactly (SigProbe = 4+20 = 24 B; Column overlay
    * rows excluded from FileBytes; `general` = all-files level).
    */
  def statsRollupSql(withSizes: Boolean = false): String = {
    val totalBytesRow = if (withSizes)
      "\n      |  UNION ALL SELECT file, 'TotalBytes', 'Bytes', CAST(filebytes AS DOUBLE) FROM perfile"
    else ""
    val sizeRows = if (withSizes)
      """
        |  UNION ALL
        |  SELECT file, 'StripeSize' AS metric, 'Bytes' AS unit, CAST(sum(size) AS DOUBLE) AS value
        |  FROM (SELECT file, CASE WHEN chunkType = 'StripeData' THEN seq ELSE parentSeq END AS skey, size
        |        FROM top WHERE chunkType IN ('StripeData','StripeIndex','StripeFooter')
        |          AND (chunkType = 'StripeData' OR parentSeq <> -1)) sz
        |  GROUP BY file, skey
        |  UNION ALL
        |  SELECT file, 'FooterSize', 'Bytes', CAST(size AS DOUBLE)
        |  FROM top WHERE chunkType = 'FileFooter'"""
    else ""
    s"""perfile AS (
      |  SELECT file,
      |    sum(CASE WHEN status IN ('raw','small','miss') THEN size ELSE 0 END) AS transfer,
      |    sum(CASE WHEN status IN ('hit','hit_linked') THEN size ELSE 0 END) AS dedup,
      |    24 * sum(CASE WHEN status IN ('hit','miss','miss_delegated') THEN 1 ELSE 0 END) AS probe,
      |    max(length(file) + 12) AS header,
      |    sum(CASE WHEN NOT (chunkType = 'Column' AND parentSeq <> -1) THEN size ELSE 0 END) AS filebytes
      |  FROM status GROUP BY file),
      |bytes AS (
      |  SELECT file, 'FileBytes' AS metric, 'Bytes' AS unit, CAST(filebytes AS DOUBLE) AS value FROM perfile
      |  UNION ALL SELECT file, 'TransferBytes', 'Bytes', CAST(transfer AS DOUBLE) FROM perfile
      |  UNION ALL SELECT file, 'DedupBytes', 'Bytes', CAST(dedup AS DOUBLE) FROM perfile
      |  UNION ALL SELECT file, 'ExtraTransferBytes', 'Bytes', CAST(probe + header AS DOUBLE) FROM perfile$totalBytesRow),
      |cnt AS (
      |  SELECT file,
      |    CASE WHEN status = 'small' AND chunkType = 'Column' THEN 'SmallColumn'
      |    ELSE concat(
      |      CASE WHEN chunkType = 'StripeData' THEN 'Stripe'
      |           WHEN chunkType = 'Column' THEN 'Column'
      |           WHEN chunkType = 'FileFooter' THEN 'Footer' ELSE 'Chunk' END,
      |      CASE WHEN status = 'hit' THEN 'Hit'
      |           WHEN status = 'small' THEN 'Small' ELSE 'Miss' END) END AS metric,
      |    'Count' AS unit, CAST(count(*) AS DOUBLE) AS value
      |  FROM status
      |  WHERE status IN ('hit','miss','miss_delegated','small')
      |  GROUP BY 1, 2),
      |typed AS (
      |  SELECT file, 'StringColumnMiss' AS metric, 'Count' AS unit, CAST(count(*) AS DOUBLE) AS value
      |  FROM status WHERE chunkType = 'Column' AND status = 'miss' AND colType = 'string' GROUP BY file
      |  UNION ALL
      |  SELECT file, 'StringColumnMissBytes', 'Bytes', CAST(sum(size) AS DOUBLE)
      |  FROM status WHERE chunkType = 'Column' AND status = 'miss' AND colType = 'string' GROUP BY file),
      |allstats AS (SELECT * FROM bytes UNION ALL SELECT * FROM cnt UNION ALL SELECT * FROM typed$sizeRows)
      |SELECT file, metric, min(unit) AS unit, sum(value) AS value,
      |  count(*) AS ocurrences, min(value) AS min_v,
      |  round(quantile_cont(value, 0.25), 6) AS p25,
      |  round(quantile_cont(value, 0.50), 6) AS p50,
      |  round(quantile_cont(value, 0.75), 6) AS p75,
      |  max(value) AS max_v
      |FROM allstats GROUP BY file, metric
      |UNION ALL
      |SELECT 'general', metric, min(unit), sum(value), count(*), min(value),
      |  round(quantile_cont(value, 0.25), 6), round(quantile_cont(value, 0.50), 6),
      |  round(quantile_cont(value, 0.75), 6), max(value)
      |FROM allstats GROUP BY metric""".stripMargin
  }

  /** Flat first-occurrence dedup in SQL: miss = chunk whose arrival key
    * is the minimum for its signature among dedup-eligible chunks. The
    * default key is fileRank·2^32 + seq (seq < 2^32); s01 prepends the
    * micro-batch id so cross-batch store growth is captured.
    */
  def flatSql(tag: String, dedupable: Set[String], threshold: Long,
              keyExpr: String = "fileRank * 4294967296 + seq",
              glob: Option[String] = None): String = {
    val d = dedupable.toSeq.sorted.map(t => s"'$t'").mkString(", ")
    s"""WITH c AS (SELECT * FROM read_parquet('${glob.getOrElse(exportGlob(tag))}')),
       |top AS (SELECT * FROM c WHERE parentSeq = -1),
       |special AS (SELECT * FROM top WHERE chunkType IN ($d) AND size > $threshold),
       |firsts AS (SELECT sig, min($keyExpr) AS fk FROM special GROUP BY sig),
       |probed AS (
       |  SELECT file, chunkType, size, parentSeq, colType,
       |    CASE WHEN $keyExpr = f.fk THEN 'miss' ELSE 'hit' END AS status
       |  FROM special JOIN firsts f USING (sig)),
       |plain AS (
       |  SELECT file, chunkType, size, parentSeq, colType,
       |    CASE WHEN chunkType IN ($d) THEN 'small' ELSE 'raw' END AS status
       |  FROM top WHERE NOT (chunkType IN ($d) AND size > $threshold)),
       |status AS (SELECT * FROM probed UNION ALL SELECT * FROM plain),
       |${statsRollupSql()}""".stripMargin
  }

  /** Hierarchical s+p cascade in SQL, mirroring [[graft.cawd.Dedup.hierarchicalStatus]]:
    * stripe probe (delegating to columns when the stripe has parsed ones),
    * linked index/footer chunks following their stripe, the column cascade
    * over delegated stripes (≤40 B bypass; ties within a stripe all first),
    * file-footer store, and raw leftovers.
    */
  def hierarchicalSql(tag: String): String =
    s"""WITH c AS (SELECT * FROM read_parquet('${exportGlob(tag)}')),
       |top AS (SELECT * FROM c),
       |stripes AS (SELECT * FROM top WHERE chunkType = 'StripeData'),
       |haskids AS (SELECT file AS c_file, parentSeq AS c_parent
       |            FROM top WHERE chunkType = 'Column'
       |            GROUP BY 1, 2 HAVING count(*) >= 2),
       |sfirst AS (SELECT sig, min(fileRank * 4294967296 + seq) AS fk FROM stripes GROUP BY sig),
       |sstat AS (
       |  SELECT s.*, CASE
       |    WHEN s.fileRank * 4294967296 + s.seq <> f.fk THEN 'hit'
       |    WHEN h.c_file IS NOT NULL THEN 'miss_delegated'
       |    ELSE 'miss' END AS status
       |  FROM stripes s JOIN sfirst f USING (sig)
       |  LEFT JOIN haskids h ON s.file = h.c_file AND s.seq = h.c_parent),
       |linked AS (
       |  SELECT t.file, t.chunkType, t.size, t.parentSeq, t.colType,
       |    CASE WHEN ss.status = 'hit' THEN 'hit_linked' ELSE 'raw' END AS status
       |  FROM top t LEFT JOIN sstat ss ON t.file = ss.file AND t.parentSeq = ss.seq
       |  WHERE t.chunkType IN ('StripeIndex','StripeFooter') AND t.parentSeq <> -1),
       |colsof AS (
       |  SELECT t.* FROM top t JOIN sstat ss ON t.file = ss.file AND t.parentSeq = ss.seq
       |  WHERE t.chunkType = 'Column' AND ss.status = 'miss_delegated'),
       |cfirst AS (SELECT sig, min(fileRank * 4294967296 + parentSeq) AS fk
       |           FROM colsof WHERE size > 40 GROUP BY sig),
       |cstat AS (
       |  SELECT b.file, b.chunkType, b.size, b.parentSeq, b.colType,
       |    CASE WHEN b.fileRank * 4294967296 + b.parentSeq = f.fk THEN 'miss' ELSE 'hit' END AS status
       |  FROM colsof b JOIN cfirst f USING (sig) WHERE b.size > 40),
       |csmall AS (SELECT file, chunkType, size, parentSeq, colType, 'small' AS status
       |           FROM colsof WHERE size <= 40),
       |foot AS (SELECT * FROM top WHERE chunkType = 'FileFooter'),
       |ffirst AS (SELECT sig, min(fileRank * 4294967296 + seq) AS fk FROM foot GROUP BY sig),
       |fstat AS (
       |  SELECT t.file, t.chunkType, t.size, t.parentSeq, t.colType,
       |    CASE WHEN t.fileRank * 4294967296 + t.seq = f.fk THEN 'miss' ELSE 'hit' END AS status
       |  FROM foot t JOIN ffirst f USING (sig)),
       |rawc AS (
       |  SELECT file, chunkType, size, parentSeq, colType, 'raw' AS status FROM top
       |  WHERE chunkType NOT IN ('StripeData','Column','FileFooter')
       |    AND NOT (chunkType IN ('StripeIndex','StripeFooter') AND parentSeq <> -1)),
       |status AS (
       |  SELECT file, chunkType, size, parentSeq, colType, status FROM sstat
       |  UNION ALL SELECT * FROM linked
       |  UNION ALL SELECT * FROM cstat
       |  UNION ALL SELECT * FROM csmall
       |  UNION ALL SELECT * FROM fstat
       |  UNION ALL SELECT * FROM rawc),
       |${statsRollupSql(withSizes = true)}""".stripMargin
}

package graft.cawd

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming variant of the dedup pipeline (SURVEY.md §2.8).
  *
  * The reference is an incremental stateful stream: files arrive in order,
  * the server's chunk stores grow monotonically and never evict
  * (`net/SpeedupClient.java:107-128`, store fields
  * `orc/net/NaiveORCReceiver.java:30`). Spark-first mapping:
  *
  *   - file arrivals = a `binaryFile` file-source stream (path-only
  *     projection — Spark reads just enough metadata to enumerate files);
  *   - the store = a parquet table PARTITIONED BY BATCH (`batch=N`
  *     subdirectories): each micro-batch OVERWRITES exactly its own
  *     partition with its first-occurrence chunks, and probes only the
  *     partitions of earlier batches. A retried batch therefore recomputes
  *     from the same store state and rewrites the same partition —
  *     exactly-once semantics without a transaction log, and the
  *     distinct-signature invariant survives partial failures;
  *   - per-batch dedup = the same first-occurrence aggregation as batch
  *     mode, with the earlier-batch store as the warm set — batch and
  *     streaming share ONE dedup implementation ([[Dedup.flatStatus]]);
  *   - ordering: in-order processing per the reference is preserved at
  *     micro-batch granularity (files within a batch are ranked by path,
  *     batches by arrival). No watermark — there is no event time.
  *
  * Store layout `batch=N/sbucket=K`: every partition is additionally
  * bucketed by `xxhash64(signature) mod` [[NumSigBuckets]], so a per-batch
  * probe prunes the store scan to the buckets its signatures can live in
  * and never shuffles the store (see [[Dedup.markFirstOccurrence]]).
  * Eviction/TTL (absent in the reference) is a retention delete of old
  * batch partitions.
  */
object StreamingEngine {

  /** Chunk-store schema columns persisted across batches. */
  private val StoreCols = Seq("signature", "chunkType", "size")

  /** Signature-bucket partition column of the persisted store. */
  val SigBucketCol = "sbucket"

  /** Store bucket fan-out. 256 keeps per-bucket directories coarse enough
    * for cheap listing while a small batch (touching ≪256 distinct buckets
    * only when it has ≪256 signatures) still prunes most of a huge store.
    */
  val NumSigBuckets = 256

  /** Conf key: batches up to this many files rank with a single bounded
    * driver collect; larger backfills use the distributed sort (see
    * [[processBatch]]). A session conf, not mutable global state (round-10
    * advice — the old `var` test seam leaked across every suite sharing
    * the JVM): StreamingSpec lowers it on its own session to drive a
    * 3-file "backfill" through the large branch without creating 2²⁰
    * files, and a real deployment can tune it per stream the same way.
    */
  private[cawd] val MaxWindowRankFilesKey =
    "spark.graft.streaming.maxWindowRankFiles"
  private[cawd] val DefaultMaxWindowRankFiles: Long = 1L << 20
  private[cawd] def maxWindowRankFiles(s: SparkSession): Long =
    s.conf.getOption(MaxWindowRankFilesKey).map { v =>
      // validate at configuration-read time, not batch time: the value is
      // used as `.toInt + 1` in a limit(), so an over-Int.MaxValue setting
      // would silently wrap negative mid-stream and a typo would NPE the
      // batch (round-11 advice). Fail fast on junk; clamp the usable range.
      val n =
        try v.toLong
        catch { case _: NumberFormatException => throw new IllegalArgumentException(
          s"$MaxWindowRankFilesKey must be a positive integer, got '$v'") }
      math.min(math.max(1L, n), Int.MaxValue - 1L)
    }.getOrElse(DefaultMaxWindowRankFiles)

  /** Deterministic signature → bucket assignment, usable on both the write
    * path and the probe's pruning filter.
    */
  def sigBucket(sig: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(sig), lit(NumSigBuckets.toLong)).cast("int")

  /** Write one store partition bucketed by signature: `dir/sbucket=K/...`.
    * Overwrite replaces the whole `batch=N` directory — retry-safe, same as
    * the previous flat layout.
    *
    * `clusterBuckets`: `partitionBy` makes every WRITE TASK open a file in
    * every bucket directory it touches, so a bulk write at W tasks × 256
    * buckets lands W·256 near-empty files — and every later probe pays
    * that file count in listing and footer reads (measured at a
    * 10⁶-signature bulk store: 8 192 files, first probe 33 s of which the
    * scan itself was ~4 s). Bulk writers (compaction, store bootstrap)
    * pass `true` to repartition ON the bucket value first — one shuffle of
    * the rows being written, ≤ [[NumSigBuckets]] output files. Micro-batch
    * writes keep the default no-shuffle path: their file count is bounded
    * by the batch's own (small) miss count, the extra stage is exactly the
    * per-batch latency round 7 fought to remove, and compaction folds
    * their files away in steady state.
    */
  def writeStorePartition(df: DataFrame, dir: String,
                          clusterBuckets: Boolean = false): Unit = {
    val withBucket = df.withColumn(SigBucketCol, sigBucket(col("signature")))
    // Clustered (bulk) writes additionally SORT by signature inside each
    // bucket and shrink page row counts: signatures are hashes, so an
    // unsorted file's per-page min/max spans the whole keyspace and a
    // probe must scan every page of every touched bucket — the measured
    // linear-in-store-bytes wide probe. Sorted + small pages, the parquet
    // column index prunes a K-signature probe to ≤ K pages per bucket
    // (store-size-INDEPENDENT), and the signature bloom filter drops
    // whole row groups for miss-heavy probes. Both engage only through
    // the probe's pushed predicate (see markFirstOccurrence's In
    // pushdown); micro-batch writes skip the sort — their files are tiny
    // and compaction re-clusters them anyway. The sort key is prefixed by
    // the partition column, so FileFormatWriter's required partition
    // ordering is already satisfied and no second sort runs.
    val arranged =
      if (clusterBuckets)
        withBucket.repartition(NumSigBuckets, col(SigBucketCol))
          .sortWithinPartitions(col(SigBucketCol), col("signature"))
      else withBucket
    val writer =
      if (clusterBuckets)
        arranged.write
          .option("parquet.bloom.filter.enabled#signature", "true")
          .option("parquet.bloom.filter.adaptive.enabled", "true")
          .option("parquet.page.row.count.limit", "4096")
      else arranged.write
    writer.mode("overwrite").partitionBy(SigBucketCol).parquet(dir)
  }

  /** Explicit store schema: a batch with zero misses still writes its
    * (empty) partition, and schema INFERENCE over a partition holding only
    * _SUCCESS throws — pinning the schema makes empty partitions read as
    * zero rows instead of bricking every later probe.
    */
  private val StoreSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("signature",
      org.apache.spark.sql.types.BinaryType),
    org.apache.spark.sql.types.StructField("chunkType",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("size",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("batch",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField(SigBucketCol,
      org.apache.spark.sql.types.IntegerType)))

  /** Store contents visible to `beforeBatch` (exclusive): the union of all
    * earlier batches' partitions. `None` reads everything (external
    * consumers).
    */
  def readStore(spark: SparkSession, storeDir: String,
                beforeBatch: Option[Long] = None): Option[DataFrame] = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p) || !fs.listStatus(p).exists(_.getPath.getName.startsWith("batch=")))
      return None
    val all = spark.read.schema(StoreSchema)
      .option("basePath", storeDir).parquet(storeDir)
    Some(beforeBatch.fold(all)(b => all.filter(col("batch") < b)))
  }

  private def batchIds(storeDir: String): Seq[Long] = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
  }

  /** Next free STREAMING batch id (max existing non-negative + 1). Batch-
    * mode partitions are negative ([[nextCliBatchId]]) and never collide
    * with the checkpoint-derived streaming sequence.
    */
  def nextBatchId(spark: SparkSession, storeDir: String): Long =
    batchIds(storeDir).filter(_ >= 0).foldLeft(-1L)(math.max) + 1

  /** Next free BATCH-MODE partition id: descending from -1. Negative ids
    * sort below every streaming micro-batch id, so a retrying stream
    * (overwriting `batch=N`) cannot clobber them, and every stream probe
    * (`batch < N`) includes them.
    */
  def nextCliBatchId(spark: SparkSession, storeDir: String): Long =
    batchIds(storeDir).filter(_ < 0).foldLeft(0L)(math.min) - 1

  /** Compact the store's batch partitions (the retention op the reference
    * never needed because its store lived on one heap): all partitions
    * EXCEPT the newest merge their distinct signatures into the
    * second-newest id, and the rest are dropped. The newest partition is
    * never touched: Structured Streaming may retry exactly that batch
    * after a crash-before-checkpoint-commit (its overwrite targets only
    * its own id, and its probe of `batch < N` still sees the full merged
    * history). Probe semantics are preserved — every surviving signature
    * stays "earlier" than any future batch — while the partition count
    * stops growing with stream age.
    */
  def compactStore(spark: SparkSession, storeDir: String): Unit = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(new Configuration())
    val batches = batchIds(storeDir)
    if (batches.length <= 2) return
    val protectedId = batches.max // possibly in-flight; never rewritten
    val mergeIds = batches.filter(_ != protectedId)
    val mergeInto = mergeIds.max
    val merged = spark.read.schema(StoreSchema)
      .option("basePath", storeDir).parquet(storeDir)
      .filter(col("batch") =!= protectedId)
      .select(StoreCols.map(col): _*)
      .dropDuplicates("signature")
      .localCheckpoint(true) // sever lineage from the files about to vanish
    // clustered: the compacted partition is the store's steady-state bulk,
    // read by every future probe — one file per bucket, not tasks×buckets
    writeStorePartition(merged, s"$storeDir/batch=$mergeInto",
      clusterBuckets = true)
    mergeIds.filter(_ != mergeInto).foreach { b =>
      fs.delete(new Path(p, s"batch=$b"), true)
    }
  }

  /** Retention delete: evict old batch partitions, bounding the store for
    * an infinite stream (the TTL the reference never needed because its
    * store lived and died on one heap). Unlike [[compactStore]] (a
    * lossless merge), retention FORGETS: an evicted signature probes as a
    * miss afterwards and is re-learned on its next arrival — the standard
    * bounded-store trade. A partition is evicted when it falls outside the
    * newest `keepBatches` ids OR its directory is older than `maxAgeMs`;
    * the newest partition is never deleted (Structured Streaming may be
    * mid-retry on exactly that id).
    */
  def retainStore(storeDir: String, keepBatches: Int = Int.MaxValue,
                  maxAgeMs: Long = Long.MaxValue): Unit = {
    require(keepBatches >= 1, "retention must keep at least the newest batch")
    val p = new Path(storeDir)
    val fs = p.getFileSystem(new Configuration())
    val batches = batchIds(storeDir).sorted
    if (batches.isEmpty) return
    val now = System.currentTimeMillis()
    val keepByCount = batches.takeRight(keepBatches).toSet
    batches.dropRight(1).foreach { b =>
      val dir = new Path(p, s"batch=$b")
      val tooOld = now - fs.getFileStatus(dir).getModificationTime > maxAgeMs
      if (!keepByCount(b) || tooOld) fs.delete(dir, true)
    }
  }

  /** Start the streaming dedup: watch `inDir` for new `suffix` files, fold
    * each micro-batch through the chunk store at `storeDir`, write per-file
    * metric rows under `statsDir`, and (optionally) the per-batch
    * chunk-status table for the external oracle under `exportDir`.
    */
  def start(spark: SparkSession, inDir: String, storeDir: String,
            statsDir: String, suffix: String, fmt: CawdEngine.Format,
            checkpointDir: String, exportDir: Option[String] = None): StreamingQuery = {
    // The whole stream runs on the latency-tuned child session (same
    // SparkContext/executors, private SQLConf): the file source's arrival
    // listing then happens driver-side instead of as a per-trigger Spark
    // job, and foreachBatch inherits the same conf. File count per batch
    // is unknown here; processBatch re-sizes shuffle partitions per batch.
    val sess = latencySession(spark, spark.sparkContext.defaultParallelism)
    // child sessions carry a private SQLConf that does not see parent
    // runtime confs — carry the caller's rank-strategy tuning across
    spark.conf.getOption(MaxWindowRankFilesKey)
      .foreach(v => sess.conf.set(MaxWindowRankFilesKey, v))
    val files = sess.readStream
      .format("binaryFile")
      .schema(org.apache.spark.sql.execution.datasources.binaryfile.BinaryFileFormat.schema)
      .option("pathGlobFilter", s"*$suffix")
      // staged waves HARDLINK the corpus (StreamingQueries.stageInto), so
      // arrivals keep the SOURCE mtime. The file source's default
      // maxFileAge (7 d, relative to the newest file seen) would then
      // silently age out part of a wave whenever corpus mtimes span >7 d —
      // e.g. an incrementally refreshed or rsync --times corpus — and the
      // only symptom is a changed row count (the zero-rows drain guard
      // only catches a fully empty wave). Arrival here is DIRECTORY
      // MEMBERSHIP, not mtime: disable age-based skipping outright.
      .option("maxFileAge", "36500d")
      // path+length only; binaryFile still materializes content — acceptable
      // because the chunkers re-read per-file anyway and the projection is
      // pruned to metadata columns below.
      .load(inDir)
      .select(col("path"), col("length"))

    files.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(sess, batch, batchId, storeDir, statsDir, fmt, exportDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** UTF-8 byte (unsigned lexicographic) ordering — identical to Spark's
    * UTF8String binary collation, so BOTH rank branches below agree with
    * each other and with what the old single-window-job branch produced.
    * (Java `String.compareTo` compares UTF-16 units, which diverges from
    * byte order for paths mixing U+E000–U+FFFF with supplementary chars.)
    */
  private[cawd] object Utf8Order extends Ordering[Array[Byte]] {
    def compare(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }

  /** Latency-tuned child session for small micro-batches, memoized per
    * parent (same SparkContext/executors/cache, private SQLConf — the same
    * isolation pattern as ConnectedComponents' loop session). AQE is OFF
    * here deliberately: AQE materializes every query stage as its own job,
    * and at streaming cadence the per-job driver round-trip IS the latency
    * floor (s01 profiling: ~20 sub-0.3 s stage-jobs per wave, no hot one).
    * With AQE off each driver action is ONE job; skew/coalescing don't
    * matter on a batch this size. Shuffle partitions follow the file count
    * (rows-not-bytes rule) so tiny batches don't launch 32-task stages.
    */
  // Driver-side file listing up to 4096 paths (default threshold 32):
  // at micro-batch cadence the distributed listing JOB is ~0.3 s of pure
  // scheduling — 3× the listing itself — and it fires twice per batch
  // (file source enumerating arrivals, store probe enumerating
  // batch=*/sbucket=* leaf dirs, both ≫ 32 paths). A local/HDFS
  // listStatus is ~ms per directory, so 4096 driver-side listings stay
  // ≪ one job's scheduling cost; an object-store deployment with
  // slow per-dir RPC should lower this back down.
  private val ListingThreshold = 4096
  private def latencySession(spark: SparkSession, nFiles: Int): SparkSession =
    graft.GraftSession.child(spark, "stream-latency", aqe = false,
      shufflePartitions = Some(
        math.min(spark.sparkContext.defaultParallelism, math.max(2, nFiles))),
      listingThreshold = Some(ListingThreshold))

  /** One micro-batch: rank new files after everything already seen, chunk,
    * probe the earlier-batch store, overwrite this batch's store/stats
    * (/export) partitions. Idempotent under retries: the probe set never
    * includes this batch's own partition, so a re-run recomputes identical
    * statuses and rewrites identical partitions.
    */
  private[cawd] def processBatch(spark: SparkSession, batch: DataFrame,
                                 batchId: Long, storeDir: String,
                                 statsDir: String, fmt: CawdEngine.Format,
                                 exportDir: Option[String] = None): Unit = {
    import spark.implicits._
    // ranks are per-batch; earlier batches' chunks are already in the store,
    // so cross-batch ordering is enforced by store membership, not rank.
    // Rank strategy = ONE bounded collect (replaces the old count action +
    // window-rank job): paths up to the 2²⁰ cap land on the driver — the
    // same ≤ ~100 MB budget the old single-task window sort already spent —
    // get ranked in UTF-8 byte order, and re-parallelize without a shuffle.
    // Larger backfills fall back to the fully distributed range-partitioned
    // sort (no driver collect beyond the capped probe, no exact count —
    // the cap probe IS the strategy pick).
    val maxRankFiles = maxWindowRankFiles(spark)
    val headPaths = batch.select(col("path"))
      .limit(maxRankFiles.toInt + 1)
      .collect().map(_.getString(0).replaceFirst("^file:", ""))
    if (headPaths.isEmpty) return
    val small = headPaths.length <= maxRankFiles
    // Large backfills must NOT inherit the latency posture this batch's
    // session may carry (the stream runs ON the latency child, whose last
    // micro-batch can have left shuffle.partitions as low as 2): a
    // million-file backfill wants AQE back on (skew/coalesce rescue) and
    // full-width shuffles, so it runs on its own default-posture child.
    val sess =
      if (small) latencySession(spark, headPaths.length)
      else graft.GraftSession.child(spark, "stream-backfill", aqe = true,
        shufflePartitions = Some(spark.sparkContext.defaultParallelism),
        listingThreshold = Some(ListingThreshold))
    val ranked: org.apache.spark.sql.Dataset[(String, Int)] =
      if (small) {
        val pairs = headPaths.sortBy(_.getBytes("UTF-8"))(Utf8Order).zipWithIndex
        // chunking parallelism follows the FILE count (a chunker walks one
        // file sequentially; tasks beyond nFiles only add launch overhead)
        val slices = math.min(spark.sparkContext.defaultParallelism, pairs.length)
        sess.createDataset(sess.sparkContext.parallelize(pairs.toSeq, slices))(
          org.apache.spark.sql.Encoders.product[(String, Int)])
      } else
        // Bind the WHOLE pipeline to the backfill child: building this via
        // the incoming `batch`'s lineage (spark.implicits' .toDF) would plan
        // chunk/probe/write under the latency child's SQLConf — AQE off,
        // shuffle.partitions as low as the last micro-batch left them — and
        // only readStore below would see the backfill posture (round-8
        // advice). Dropping to the RDD severs the old lineage; createDataFrame
        // on `sess` re-roots it.
        sess.createDataFrame(
          batch.select(col("path")).as[String].rdd
            .map(_.replaceFirst("^file:", ""))
            .sortBy(_.getBytes("UTF-8"))(Utf8Order, scala.reflect.classTag[Array[Byte]])
            .zipWithIndex()
            .map { case (p, i) => (p, i.toInt) }
            .repartition(spark.sparkContext.defaultParallelism))
          .toDF("path", "fileRank")
          .as[(String, Int)](org.apache.spark.sql.Encoders.product[(String, Int)])
    // ORC streams dedup with the NAIVE vocabulary, so chunk in Naive mode
    // too — StripeColumn's linked chunks (parentSeq != -1) would silently
    // fall out of flatStatus's top-level filter and the exported table
    val chunks = CawdEngine.chunkFileDs(ranked, fmt, orcMode = OrcChunker.Naive)
    val dedupable = fmt match {
      case CawdEngine.Parquet => ChunkType.parquetDedupable
      case CawdEngine.Orc     => ChunkType.naiveOrcDedupable
    }
    // stats/export see basenames so downstream output (and the DuckDB
    // oracle re-deriving it) doesn't depend on temp-dir paths
    val chunkDf = chunks.toDF().cache() // ours to release; flatStatus reuses it
    val status = Dedup.flatStatus(chunkDf, dedupable,
      store = readStore(sess, storeDir, beforeBatch = Some(batchId)))
      .withColumn("file", regexp_replace(col("file"), ".*/", ""))
      .cache()
    // audit hook (no-op unless PlanAudit enabled it): the probe/dedup plan
    // that actually runs inside this micro-batch — the foreachBatch
    // interior the audit cannot reach from the outer streaming query
    graft.StreamingPlanCapture.record("s01-batch",
      status.queryExecution.executedPlan.toString)
    try {
      // Sequential sinks, deliberately: a concurrent-Futures variant was
      // measured SLOWER (6.2 s → 11.6 s for the two-wave run) — three
      // simultaneous jobs racing the cold `status` cache serialize on its
      // per-partition locks and thrash the scheduler.
      // insert-on-miss: this batch's first occurrences, keyed to its own
      // partition (overwrite = retry-safe), bucketed by signature
      // Large backfills take the clustered write path: their miss count is
      // unbounded, so the no-shuffle path would land tasks × buckets
      // near-empty files (the measured 8 192-file pathology) until a
      // compaction ran. Micro-batches keep the no-shuffle latency path.
      writeStorePartition(
        status.filter(col("status") === "miss").select(StoreCols.map(col): _*),
        s"$storeDir/batch=$batchId", clusterBuckets = !small)
      Stats.fromStatus(status)
        .write.mode("overwrite").parquet(s"$statsDir/batch_id=$batchId")
      // chunk-status table for the external oracle: cross-batch dedup is
      // re-derivable as first-occurrence by (batchId, fileRank, seq)
      exportDir.foreach { dir =>
        status.select(col("file"), lit(batchId).as("batchId"),
          col("fileRank"), col("seq"), col("chunkType"), col("start"),
          col("size"), col("colId"), col("colType"), col("parentSeq"),
          lower(hex(col("signature"))).as("sig"),
          col("status").as("engine_status"))
          .write.mode("overwrite").parquet(s"$dir/batch=$batchId")
      }
    } finally {
      status.unpersist()
      chunkDf.unpersist()
    }
  }

  /** Batch view over the accumulated streaming stats (per-file + global
    * rollup, same shape as the batch engine's output).
    */
  def statsRollup(spark: SparkSession, statsDir: String): DataFrame = {
    // same latency POSTURE as the micro-batches (AQE off, driver-side
    // listing — the rollup reads a few dozen small per-batch files), but a
    // SEPARATE child: sharing the micro-batch child's mutable SQLConf
    // raced a rollup invoked mid-stream against a batch planning on the
    // same session (round-7 advice) — distinct tags give distinct
    // sessions, so neither resizes the other's shuffles.
    val sess = graft.GraftSession.child(spark, "stream-stats", aqe = false,
      shufflePartitions = Some(spark.sparkContext.defaultParallelism),
      listingThreshold = Some(ListingThreshold))
    Stats.rollup(sess.read.option("basePath", statsDir).parquet(statsDir)
      .drop("batch_id"))
  }
}

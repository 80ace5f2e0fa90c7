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
  *   - the store = a persisted parquet table of `(signature, chunkType,
  *     size)` appended once per micro-batch inside `foreachBatch` — the
  *     durable analogue of the reference's in-heap HashMap, and the only
  *     state that must survive restarts (exactly-once via the streaming
  *     checkpoint + idempotent signature-keyed appends);
  *   - per-batch dedup = the same first-occurrence aggregation as batch
  *     mode, with the store as the warm set — so batch and streaming share
  *     ONE dedup implementation ([[Dedup.flatStatus]]);
  *   - ordering: in-order processing per the reference is preserved at
  *     micro-batch granularity (files within a batch are ranked by path,
  *     batches by arrival). No watermark — there is no event time.
  *
  * At scale the store table should be bucketed by signature so the per-batch
  * anti-join is a co-partitioned shuffle-free probe; eviction/TTL (absent in
  * the reference) hangs off the same table as a retention delete.
  */
object StreamingEngine {

  /** Chunk-store schema columns persisted across batches. */
  private val StoreCols = Seq("signature", "chunkType", "size")

  def readStore(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(new Configuration())
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      Some(spark.read.parquet(storeDir))
    else None
  }

  /** Start the streaming dedup: watch `inDir` for new `suffix` files, fold
    * each micro-batch through the chunk store at `storeDir`, append per-file
    * metric rows to `statsDir`.
    */
  def start(spark: SparkSession, inDir: String, storeDir: String,
            statsDir: String, suffix: String, fmt: CawdEngine.Format,
            checkpointDir: String, exportDir: Option[String] = None): StreamingQuery = {
    val files = spark.readStream
      .format("binaryFile")
      .schema(org.apache.spark.sql.execution.datasources.binaryfile.BinaryFileFormat.schema)
      .option("pathGlobFilter", s"*$suffix")
      // path+length only; binaryFile still materializes content — acceptable
      // because the chunkers re-read per-file anyway and the projection is
      // pruned to metadata columns below.
      .load(inDir)
      .select(col("path"), col("length"))

    files.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, storeDir, statsDir, fmt, exportDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One micro-batch: rank new files after everything already seen, chunk,
    * probe the persisted store, append misses to the store and metric rows
    * to the stats sink.
    */
  private[cawd] def processBatch(spark: SparkSession, batch: DataFrame,
                                 batchId: Long, storeDir: String,
                                 statsDir: String, fmt: CawdEngine.Format,
                                 exportDir: Option[String] = None): Unit = {
    val paths = batch.select("path").collect().map(_.getString(0)).sorted
    if (paths.isEmpty) return
    // ranks are per-batch; earlier batches' chunks are already in the store,
    // so cross-batch ordering is enforced by store membership, not rank.
    val ranked = paths.zipWithIndex.map { case (p, i) =>
      (p.stripPrefix("file:"), i)
    }
    val chunks = CawdEngine.chunkFiles(spark, ranked.toSeq, fmt)
    val dedupable = fmt match {
      case CawdEngine.Parquet => ChunkType.parquetDedupable
      case CawdEngine.Orc     => ChunkType.naiveOrcDedupable
    }
    // stats/export see basenames so downstream output (and the DuckDB
    // oracle re-deriving it) doesn't depend on temp-dir paths
    val status = Dedup.flatStatus(chunks.toDF(), dedupable,
      store = readStore(spark, storeDir))
      .withColumn("file", regexp_replace(col("file"), ".*/", ""))
      .cache()
    try {
      // insert-on-miss: append this batch's first-occurrence chunks
      status.filter(col("status") === "miss")
        .select(StoreCols.map(col): _*)
        .write.mode("append").parquet(storeDir)
      Stats.fromStatus(status)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(statsDir)
      // chunk-status table for the external oracle: cross-batch dedup is
      // re-derivable as first-occurrence by (batchId, fileRank, seq)
      exportDir.foreach { dir =>
        status.select(col("file"), lit(batchId).as("batchId"),
          col("fileRank"), col("seq"), col("chunkType"), col("start"),
          col("size"), col("colId"), col("colType"), col("parentSeq"),
          lower(hex(col("signature"))).as("sig"),
          col("status").as("engine_status"))
          .write.mode("append").parquet(dir)
      }
    } finally status.unpersist()
  }

  /** Batch view over the accumulated streaming stats (per-file + global
    * rollup, same shape as the batch engine's output).
    */
  def statsRollup(spark: SparkSession, statsDir: String): DataFrame =
    Stats.rollup(spark.read.parquet(statsDir).drop("batch_id"))
}

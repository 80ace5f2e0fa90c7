package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession factory so every main/test runs with identical,
  * scale-appropriate settings.
  *
  * - `spark.sql.shuffle.partitions` = core count (local mode); on a real
  *   cluster this is left to AQE coalescing, which is enabled.
  * - `spark.sql.legacy.parquet.nanosAsLong`: the driver corpus's
  *   `events.ts` column is TIMESTAMP(NANOS) (written by pyarrow), which
  *   Spark 4 cannot map natively; we read it as nanos-since-epoch LONG and
  *   convert in [[Tables.events]].
  */
object GraftSession {
  def get(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Blob-aware scan batching: the vectorized parquet reader sizes
      // batches by ROW COUNT (default 4096), so a binary media column at
      // ~13 kB/row reserves ~50 MB contiguous per batch per task — 32
      // concurrent tasks OOM'd an 8 GB driver reading the 100× media
      // export. 1024 rows keeps blob batches ~13 MB while costing narrow
      // scans nothing measurable (batch overhead amortizes by ~100 rows).
      // An engine whose tables carry opaque media blobs needs row-batch
      // sizing that survives the widest row, not the average one.
      .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

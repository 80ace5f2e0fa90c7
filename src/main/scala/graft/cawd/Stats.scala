package graft.cawd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TransferStats aggregations (SURVEY.md §2.5).
  *
  * The reference aggregates per-file metric lists with sum/count and an
  * exact percentile bundle over the sorted sample list
  * (`common/TransferStats.java:49-72,129-155`), then re-aggregates all files
  * under file="general" (`TransferStats.java:38-47`). Its p50/p75 values are
  * a copy-paste of p25 (`:148-155`) — fixed here, as SURVEY.md §4 defect 2
  * prescribes.
  *
  * Spark-first shape: metric rows are plain (file, metric, value, unit)
  * tuples; the rollup is a hash aggregate with map-side combine, and the
  * percentile bundle uses the exact built-in `percentile` (sort happens
  * inside the aggregate buffer, not as a global sort). The two-level rollup
  * is expressed as `rollup(file)` so Spark computes the per-file and global
  * rows in ONE pass instead of the reference's aggregate-then-reaggregate.
  */
object Stats {

  /** A1+A2+A3 in one plan: per-(file, metric) and global-(metric) summary
    * rows. The global level surfaces with file = "general", matching the
    * reference's label (`TransferStats.java:41`).
    */
  def rollup(stats: DataFrame): DataFrame = {
    stats
      // rollup order (metric, file): the subtotal cell (metric, NULL) is the
      // all-files global aggregate per metric — the reference's "general" row.
      .rollup(col("metric"), col("file"))
      .agg(
        first(col("unit")).as("unit"),
        sum(col("value")).as("value"),
        count(lit(1)).as("ocurrences"), // sic — reference field name, TransferStats.java:30
        min(col("value")).as("min_v"),
        round(expr("percentile(value, 0.25)"), 6).as("p25"),
        round(expr("percentile(value, 0.50)"), 6).as("p50"),
        round(expr("percentile(value, 0.75)"), 6).as("p75"),
        max(col("value")).as("max_v"))
      // drop the grand-total (NULL, NULL) row; keep exactly the reference's
      // two levels: per-(file, metric) and global-(metric).
      .filter(col("metric").isNotNull)
      .withColumn("file", coalesce(col("file"), lit("general")))
      .select("file", "metric", "unit", "value", "ocurrences",
        "min_v", "p25", "p50", "p75", "max_v")
  }

  /** A4: derive the wire/dedup metric rows from a dedup-status chunk set.
    *
    * One consistent accounting model on every variant (SURVEY.md §4 defect
    * 6 is NOT replicated):
    *   - TransferBytes      = content bytes actually sent (raw+miss+small)
    *   - DedupBytes         = content bytes saved by store hits
    *   - ExtraTransferBytes = protocol overhead: one `<type:int><sha1:20>`
    *     probe per special chunk (hit or miss) + per-file header
    *   - *Hit / *Miss       = probe counters by chunk kind; small column
    *     bypasses count as `SmallColumn` (TransferStats.java:105)
    *   - StringColumnMiss / StringColumnMissBytes = typed miss counters for
    *     string columns (`StripePlusColumnORCStreamer.java:180-184`; the
    *     Double* types are declared dead in the reference — not emitted)
    *
    * With `emitSizes` (the s+p pipeline; the reference only emits these
    * there, `StripePlusColumnORCStreamer.java:37,88,370`):
    *   - StripeSize = index+data+footer bytes, one row per stripe
    *   - FooterSize = file-footer bytes, one row per file
    *   - TotalBytes = whole file length, one row per file
    */
  def fromStatus(statusDf: DataFrame, emitSizes: Boolean = false): DataFrame = {
    val probed = col("status").isin("hit", "miss", "miss_delegated")
    val sent = col("status").isin("raw", "small", "miss")
    val kind = when(col("chunkType") === ChunkType.StripeData, "Stripe")
      .when(col("chunkType") === ChunkType.Column, "Column")
      .when(col("chunkType") === ChunkType.FileFooter, "Footer")
      .otherwise("Chunk")

    // Column subchunks of delegated stripes OVERLAY their stripe's data
    // region — exclude them from FileBytes so it equals the file's length.
    val topLevel = !(col("chunkType") === ChunkType.Column && col("parentSeq") =!= -1)
    val perFile = statusDf.groupBy(col("file")).agg(
      sum(when(sent, col("size")).otherwise(0L)).as("transfer"),
      sum(when(col("status").isin("hit", "hit_linked"), col("size")).otherwise(0L)).as("dedup"),
      sum(when(probed, lit(Dedup.Wire.SigProbe)).otherwise(0L)).as("probeOverhead"),
      max(length(col("file")) + lit(Dedup.Wire.FileHeaderFixed)).as("headerOverhead"),
      sum(when(topLevel, col("size")).otherwise(0L)).as("fileBytes"))

    val counters = statusDf
      .filter(probed || col("status") === "small")
      .groupBy(col("file"),
        when(col("status") === "small" && col("chunkType") === ChunkType.Column,
          lit(Metric.SmallColumn))
          .otherwise(concat(kind,
            when(col("status") === "hit", lit("Hit"))
              .when(col("status") === "small", lit("Small"))
              .otherwise(lit("Miss")))).as("metric"))
      .agg(count(lit(1)).cast("double").as("value"))
      .withColumn("unit", lit(Metric.Count))

    val stringMisses = statusDf
      .filter(col("chunkType") === ChunkType.Column &&
        col("status") === "miss" && col("colType") === "string")
      .groupBy(col("file"))
      .agg(count(lit(1)).cast("double").as("nmiss"),
        sum(col("size")).cast("double").as("bmiss"))
    val typedRows = stringMisses
      .select(col("file"), lit(Metric.StringColumnMiss).as("metric"),
        col("nmiss").as("value"), lit(Metric.Count).as("unit"))
      .unionByName(stringMisses
        .select(col("file"), lit(Metric.StringColumnMissBytes).as("metric"),
          col("bmiss").as("value"), lit(Metric.Bytes).as("unit")))

    val byteMap = Seq(
      lit(Metric.FileBytes), col("fileBytes").cast("double"),
      lit(Metric.TransferBytes), col("transfer").cast("double"),
      lit(Metric.DedupBytes), col("dedup").cast("double"),
      lit(Metric.ExtraTransferBytes),
      (col("probeOverhead") + col("headerOverhead")).cast("double")) ++
      (if (emitSizes) Seq(lit(Metric.TotalBytes), col("fileBytes").cast("double"))
       else Seq.empty)
    val byteRows = perFile.select(col("file"), explode(map(byteMap: _*))
        .as(Seq("metric", "value")))
      .withColumn("unit", lit(Metric.Bytes))

    val base = byteRows
      .unionByName(counters.select("file", "metric", "value", "unit"))
      .unionByName(typedRows)

    if (!emitSizes) base else {
      val stripeSizes = statusDf
        .filter(col("chunkType").isin(ChunkType.StripeData, ChunkType.StripeIndex,
            ChunkType.StripeFooter) &&
          (col("chunkType") === ChunkType.StripeData || col("parentSeq") =!= -1))
        .groupBy(col("file"),
          when(col("chunkType") === ChunkType.StripeData, col("seq"))
            .otherwise(col("parentSeq")).as("__stripe"))
        .agg(sum(col("size")).cast("double").as("value"))
        .select(col("file"), lit(Metric.StripeSize).as("metric"),
          col("value"), lit(Metric.Bytes).as("unit"))
      val footerSizes = statusDf.filter(col("chunkType") === ChunkType.FileFooter)
        .select(col("file"), lit(Metric.FooterSize).as("metric"),
          col("size").cast("double").as("value"), lit(Metric.Bytes).as("unit"))
      base.unionByName(stripeSizes).unionByName(footerSizes)
    }
  }
}

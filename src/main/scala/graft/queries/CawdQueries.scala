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
  * These operate on raw file BYTES (structural chunking), so no DuckDB
  * oracle can express them — they are registered without `oracleSql` and
  * take the driver's rows-only check. Outputs are small deterministic
  * aggregates (chunk-type counts, per-metric stats, per-file booleans).
  */
object CawdQueries {

  /** Deterministic ORC fixtures: testdata tables re-written as single ORC
    * files under the JVM tmpdir (one dir per sf). Sorted single-partition
    * writes → byte-stable files per round.
    */
  def ensureOrcFixtures(spark: SparkSession, sfDir: String): String = {
    val sfName = sfDir.replaceAll(".*/", "")
    val outDir = s"${sys.props("java.io.tmpdir")}/graft-orc-fixtures/$sfName"
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

  /** Stats pipelines produce (file, metric, ...) rollups; normalize file to
    * its basename so output doesn't depend on tmpdir/sf paths.
    */
  private def normalized(df: DataFrame): DataFrame =
    df.withColumn("file", base(col("file")))
      .orderBy("file", "metric")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S4: structural parquet chunk table over every corpus parquet file.
    "c01_parquet_chunk_table" -> ((s, d) => {
      val files = CawdEngine.listFiles(d, ".parquet")
      CawdEngine.chunkFiles(s, files, CawdEngine.Parquet).toDF()
        .groupBy(base(col("file")).as("file"), col("chunkType"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("size")).as("bytes"))
        .orderBy("file", "chunkType")
    }),

    // S4+J1+A1-A4: parquet pipeline, cold store (every first-occurrence
    // chunk misses; intra-corpus duplicate pages dedup).
    "c02_parquet_dedup_cold" -> ((s, d) =>
      normalized(CawdEngine.flatDedupStats(s, d, CawdEngine.Parquet))),

    // Warm-store parity KPI (BASELINE.md): file + byte-identical copy →
    // copies' DedupBytes ≈ dedupable section bytes.
    "c03_parquet_dedup_warm" -> ((s, d) =>
      normalized(CawdEngine.flatDedupStats(s, d, CawdEngine.Parquet, duplicate = true))),

    // S1+J1: naive ORC stripe dedup, warm.
    "c04_orc_naive_dedup_warm" -> ((s, d) => {
      val orcDir = ensureOrcFixtures(s, d)
      normalized(CawdEngine.flatDedupStats(s, orcDir, CawdEngine.Orc, duplicate = true))
    }),

    // S2+P3: column-based ORC dedup with the reference's 50 B small-column
    // bypass (`orc/net/ColumnBasedORCStreamer.java:109`), warm.
    "c08_orc_column_dedup_warm" -> ((s, d) => {
      val orcDir = ensureOrcFixtures(s, d)
      normalized(CawdEngine.flatDedupStats(s, orcDir, CawdEngine.Orc,
        duplicate = true, orcMode = OrcChunker.ColumnBased, smallThreshold = 50L))
    }),

    // S3+J3-J5: hierarchical stripe→column cascade, warm.
    "c05_orc_sp_cascade_warm" -> ((s, d) => {
      val orcDir = ensureOrcFixtures(s, d)
      normalized(CawdEngine.hierarchicalDedupStats(s, orcDir, duplicate = true))
    }),

    // S7: byte-identity reconstruction over both formats.
    "c06_reconstruction" -> ((s, d) => {
      val orcDir = ensureOrcFixtures(s, d)
      val orc = CawdEngine.chunkFiles(s, CawdEngine.listFiles(orcDir, ".orc"),
        CawdEngine.Orc, OrcChunker.StripeColumn, withContent = true)
      val pq = CawdEngine.chunkFiles(s, CawdEngine.listFiles(d, ".parquet"),
        CawdEngine.Parquet, withContent = true)
      CawdEngine.reconstructionCheck(orc)
        .unionByName(CawdEngine.reconstructionCheck(pq))
        .withColumn("file", base(col("file")))
        .orderBy("file")
    }),

    // S6: plain no-dedup baseline — fixed 4096 B frames, no chunk smarts
    // (`net/SpeedupStreamer.java:50-134`). Pure metadata computation.
    "c07_plain_baseline" -> ((s, d) => {
      import s.implicits._
      val files = CawdEngine.listFiles(d, ".parquet").map(_._1)
      val sizes = files.map { f =>
        val p = new Path(f)
        val fs = p.getFileSystem(new Configuration())
        (f, fs.getFileStatus(p).getLen)
      }
      s.createDataset(sizes).toDF("file", "bytes")
        .select(
          base(col("file")).as("file"),
          col("bytes").as("transfer_bytes"),
          ceil(col("bytes") / 4096.0).cast("long").as("frames"),
          (length(base(col("file"))) + 12).cast("long").as("extra_bytes"))
        .orderBy("file")
    })
  )

  /** Raw-file structural ops — not expressible in SQL over the tables. */
  val oracle: Map[String, String] = Map.empty
}

package graft.queries

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cawd.{CawdEngine, StreamingEngine}

/** Streaming dedup exercised as a batch-checkable query: two file-arrival
  * waves (originals, then byte-identical copies) through the Structured
  * Streaming engine; the cross-batch chunk store must dedup wave 2 fully.
  * Raw-file op → rows-only driver check; output is deterministic anyway.
  */
object StreamingQueries {

  private def copyInto(fs: org.apache.hadoop.fs.FileSystem, conf: Configuration,
                       srcs: Seq[String], destDir: Path, prefix: String): Unit =
    srcs.foreach { s =>
      val src = new Path(s)
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
        new Path(destDir, prefix + src.getName), false, conf)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_streaming_dedup" -> ((s, d) => {
      val conf = new Configuration()
      val root = new Path(s"${sys.props("java.io.tmpdir")}/graft-stream/${UUID.randomUUID()}")
      val fs = root.getFileSystem(conf)
      val inDir = new Path(root, "in"); fs.mkdirs(inDir)
      val store = new Path(root, "store").toString
      val stats = new Path(root, "stats").toString
      val ckpt = new Path(root, "ckpt").toString
      val srcs = CawdEngine.listFiles(d, ".parquet").map(_._1)
      try {
        // wave 1: originals arrive
        copyInto(fs, conf, srcs, inDir, "")
        StreamingEngine.start(s, inDir.toString, store, stats, ".parquet",
          CawdEngine.Parquet, ckpt).awaitTermination()
        // wave 2: byte-identical copies arrive later
        copyInto(fs, conf, srcs, inDir, "zz_copy_")
        StreamingEngine.start(s, inDir.toString, store, stats, ".parquet",
          CawdEngine.Parquet, ckpt).awaitTermination()

        StreamingEngine.statsRollup(s, stats)
          .withColumn("file", regexp_replace(col("file"), ".*/", ""))
          .orderBy("file", "metric")
          // materialize before the temp tree is deleted
          .localCheckpoint(true)
      } finally fs.delete(root, true)
    })
  )

  val oracle: Map[String, String] = Map.empty
}

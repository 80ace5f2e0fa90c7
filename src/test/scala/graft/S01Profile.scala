package graft

import java.util.UUID
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.cawd.{CawdEngine, StreamingEngine}

/** Dev-only phase profiler for s01: times each stage of the two-wave
  * streaming dedup so the fixed overhead can be attributed.
  */
object S01Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("s01-profile")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s01prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm the JVM/session on a trivial job first
    spark.range(1000).count()

    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(e.jobId, (System.nanoTime(),
          Option(e.properties.getProperty("spark.job.description")).getOrElse("?").take(80)))
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(starts.remove(e.jobId)).foreach { case (t0, desc) =>
          jobLog.add((e.jobId, System.nanoTime() - t0, desc))
        }
    })

    (1 to 2).foreach { round =>
      val conf = new Configuration()
      val root = new Path(s"/dev/shm/graft-stream/prof-${UUID.randomUUID()}")
      val fs = root.getFileSystem(conf)
      val inDir = new Path(root, "in"); fs.mkdirs(inDir)
      val store = new Path(root, "store").toString
      val stats = new Path(root, "stats").toString
      val ckpt = new Path(root, "ckpt").toString
      val srcs = CawdEngine.listFiles(d, ".parquet").map(_._1)
      def copyWave(prefix: String): Unit =
        srcs.foreach { s =>
          val src = new Path(s)
          org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
            new Path(inDir, prefix + src.getName), false, conf)
        }
      println(s"[s01prof] === round $round ===")
      phase("copy wave1")(copyWave(""))
      phase("wave1 stream")(
        StreamingEngine.start(spark, inDir.toString, store, stats, ".parquet",
          CawdEngine.Parquet, ckpt, None).awaitTermination())
      phase("copy wave2")(copyWave("zz_copy_"))
      jobLog.clear()
      phase("wave2 stream")(
        StreamingEngine.start(spark, inDir.toString, store, stats, ".parquet",
          CawdEngine.Parquet, ckpt, None).awaitTermination())
      if (round == 2) {
        Thread.sleep(300)
        var sum = 0.0
        jobLog.forEach { case (id, ns, desc) =>
          sum += ns / 1e9
          println(f"[s01prof]   job $id%3d ${ns / 1e9}%6.2f s  $desc")
        }
        println(f"[s01prof]   wave2 job time total $sum%6.2f s")
      }
      phase("rollup")(
        StreamingEngine.statsRollup(spark, stats).orderBy("file", "metric")
          .localCheckpoint(true))
      val nStoreFiles = fs.globStatus(new Path(store + "/batch=*/sbucket=*/part-*")).length
      val nStatsFiles = fs.globStatus(new Path(stats + "/batch_id=*/part-*")).length
      println(s"[s01prof] store part files: $nStoreFiles, stats part files: $nStatsFiles")
      fs.delete(root, true)
    }

    // the REAL s01 query (with export), warm second run with job attribution
    println("[s01prof] === real s01 (warm, 2nd run) ===")
    phase("real s01 run1")(
      queries.StreamingQueries.queries("s01_streaming_dedup")(spark, d).count())
    jobLog.clear()
    phase("real s01 run2")(
      queries.StreamingQueries.queries("s01_streaming_dedup")(spark, d).count())
    Thread.sleep(300)
    var sum = 0.0
    jobLog.forEach { case (id, ns, desc) =>
      sum += ns / 1e9
      println(f"[s01prof]   job $id%3d ${ns / 1e9}%6.2f s  $desc")
    }
    println(f"[s01prof]   real-s01 job time total $sum%6.2f s")
    spark.stop()
  }
}

package graft

/** Dev-only: dump a query's final adaptive plan plus per-stage task counts
  * and CPU, to locate which stage dominates and how wide it runs.
  * Usage: Test/runMain graft.E02PlanProbe [sfDir] [queryName]
  */
object E02PlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val q = if (args.length > 1) args(1) else "e02_lsh_topk"
    val spark = GraftSession.get("plan-probe")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.put(i.stageId, (i.numTasks, m.executorCpuTime / 1000000L,
          m.shuffleWriteMetrics.bytesWritten, m.diskBytesSpilled,
          m.memoryBytesSpilled, i.name.take(60)))
      }
    })
    val df = SparkEntry.queries(q)(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    println("===== final plan =====")
    println(df.queryExecution.executedPlan.treeString)
    println("===== stages by cpu (id, tasks, cpuMs, shufWrMB, diskSpillMB, memSpillMB) =====")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2._2).take(20).foreach { case (id, v) =>
      println(f"stage $id%4d tasks=${v._1}%5d cpuMs=${v._2}%8d shufWr=${v._3 / 1e6}%9.0f disk=${v._4 / 1e6}%9.0f mem=${v._5 / 1e6}%9.0f  ${v._6}")
    }
    spark.stop()
  }
}

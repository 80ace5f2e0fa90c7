package graft

/** Dev-only: dump e02's final adaptive plan plus per-stage task counts, to
  * locate which stage the sign-LSH kernel lands in and how wide it runs.
  */
object E02PlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("e02-plan-probe")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val cpu = i.taskMetrics.executorCpuTime / 1000000L
        stages.put(i.stageId, (i.numTasks, cpu))
      }
    })
    val df = SparkEntry.queries("e02_lsh_topk")(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    println("===== final plan =====")
    println(df.queryExecution.executedPlan.treeString)
    println("===== stages (id, tasks, cpuMs) =====")
    stages.forEach { (id, v) => println(s"stage $id tasks=${v._1} cpuMs=${v._2}") }
    spark.stop()
  }
}

package graft
object S01PlanDump {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("s01-dump")
    StreamingPlanCapture.enabled = true
    StreamingPlanCapture.reset()
    SparkEntry.queries("s01_streaming_dedup")(spark, sf)
      .write.format("noop").mode("overwrite").save()
    StreamingPlanCapture.all.foreach { case (n, p) =>
      println(s"===== $n =====")
      println(p.split("\n").filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Sort ") ||
        l.contains("FileScan")).mkString("\n").take(4000))
    }
    spark.stop()
  }
}

package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("plan-dump")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    StreamingPlanCapture.enabled = true
    Seq("s07_stream_static_decontam", "s01_streaming_dedup").foreach { q =>
      StreamingPlanCapture.reset()
      SparkEntry.queries(q)(spark, sf).count()
      StreamingPlanCapture.all.foreach { case (tag, p) =>
        println(s"===== $q :: $tag =====")
        println(p)
      }
    }
    spark.stop()
  }
}

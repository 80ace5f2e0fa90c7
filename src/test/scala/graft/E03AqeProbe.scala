package graft

/** Dev-only: is e03's 100× wall dominated by AQE stage-materialization
  * barriers? Times the query on the default session vs an AQE-off child.
  */
object E03AqeProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf10-r7")
    val q = if (args.length > 1) args(1) else "e03_ivf_topk"
    val spark = GraftSession.get("e03-aqe-probe")
    def run(s: org.apache.spark.sql.SparkSession, label: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(s, d).write.format("noop").mode("overwrite").save()
      println(f"[aqe] $label%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      s.catalog.clearCache(); System.gc()
    }
    run(spark, "aqe-on (warm0)")
    run(spark, "aqe-on")
    val off = spark.newSession()
    off.conf.set("spark.sql.adaptive.enabled", "false")
    run(off, "aqe-off")
    run(spark, "aqe-on (again)")
    run(off, "aqe-off (again)")
    spark.stop()
  }
}

package graft

/** Dev-only: q07/q08 physical plans — does q07 get Spark's WindowGroupLimit
  * partial top-k below the segment exchange, and what does q08's distinct
  * aggregate shuffle look like?
  */
object Q078Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("q078-probe")
    Seq("q07_topk_window", "q08_distinct_parts").foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        .toString.linesIterator.map(_.take(200)).mkString("\n"))
    }
    spark.stop()
  }
}

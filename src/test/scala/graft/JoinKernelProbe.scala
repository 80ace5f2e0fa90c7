package graft

/** Dev-only: which executed plans evaluate a dense kernel inside a JOIN
  * condition (Catalyst substitutes pushed predicates into join conditions —
  * the d22 levenshtein finding)? Feeds the PlanAudit join-condition gate's
  * whitelist.
  */
object JoinKernelProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("join-kernel-probe")
    val kernels = Seq("sign_lsh_buckets", "winnow_fp", "cosine_sim", "dot_product")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        plan.linesIterator.zipWithIndex.foreach { case (l, i) =>
          val t = l.trim
          if (t.contains("Join") && kernels.exists(t.contains))
            println(s"$name:$i JOIN+KERNEL ${t.take(240)}")
        }
      } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

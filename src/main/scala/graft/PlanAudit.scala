package graft

/** Physical-plan audit over every registered query: prints join red flags
  * and per-scan column counts so scale regressions (a nested-loop join
  * sneaking in, a scan losing its column pruning) show up as a diff.
  *
  * Expected flags at head: e01 reports NLJ — it is the labeled brute-force
  * baseline (broadcast query side × corpus, quadratic BY DESIGN; e02/e03
  * are the scale paths). SortMergeJoin is not a red flag: it is the right
  * physical join for large-large equi-joins (shingle and band joins).
  *
  * Run: `sbt "runMain graft.PlanAudit [sfDir]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("plan-audit")
    // default 100-char truncation would cut ReadSchema mid-field and hide
    // exactly the pruning regressions this audit exists to catch
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val flags = Seq(
          "NLJ" -> plan.contains("BroadcastNestedLoopJoin"),
          "CARTESIAN" -> plan.contains("CartesianProduct"),
          "SMJ" -> plan.contains("SortMergeJoin")
        ).collect { case (f, true) => f }
        // count TOP-LEVEL fields of each ReadSchema (nested array<>/struct<>
        // types must not truncate the match or inflate the count)
        val scans = "ReadSchema: struct<(.*)>".r.findAllMatchIn(plan).map { m =>
          var depth = 0
          var fields = if (m.group(1).isEmpty) 0 else 1
          m.group(1).foreach {
            case '<'              => depth += 1
            case '>'              => depth -= 1
            case ',' if depth == 0 => fields += 1
            case _                =>
          }
          fields
        }.toSeq
        val unexpected = (flags.contains("CARTESIAN")
          || (flags.contains("NLJ") && name != "e01_cosine_topk"))
        if (unexpected) bad += 1
        println(s"AUDIT $name flags=${flags.mkString("+")}" +
          s" scanCols=${scans.mkString(",")}${if (unexpected) "  <-- UNEXPECTED" else ""}")
      } catch {
        case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}

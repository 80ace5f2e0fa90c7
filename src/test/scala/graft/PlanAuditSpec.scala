package graft

import org.scalatest.funsuite.AnyFunSuite

/** The KERNEL_FILTER audit gate must (a) stay silent on head plans, where
  * InferFiltersFromGenerate is excluded, and (b) fire on the pathological
  * shape the exclusion prevents — proven by re-enabling the rule in a
  * runtime conf and planning the same kernel-explode query.
  */
class PlanAuditSpec extends AnyFunSuite {

  test("kernel-bearing Filter gate: silent at head conf, fires with the rule back on") {
    val spark = GraftSession.get("plan-audit-spec")
    Tables.embeddingsDense(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("embeddings")
    val sql =
      """SELECT vec_id, band, bucket
        |FROM (SELECT vec_id, sign_lsh_buckets(embedding, 4, 8, 'q2:') AS bks
        |      FROM embeddings) e
        |LATERAL VIEW posexplode(bks) t AS band, bucket""".stripMargin

    val headPlan = spark.sql(sql).queryExecution.executedPlan.toString
    assert(!PlanAudit.kernelFilterFlag(headPlan),
      "head plan must not evaluate a kernel inside a Filter")

    // re-enable the rule (runtime conf) and re-plan: the inferred
    // size/isnotnull guard re-appears with the kernel substituted in.
    // Restore the VALUE SAVED before mutating, not a hard-coded list — the
    // memoized session outlives this test, and a stale restore would leak
    // into every later suite in the JVM if GraftSession's exclusions grow.
    val saved = spark.conf.get("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules", "")
    try {
      val badPlan = spark.sql(sql).queryExecution.executedPlan.toString
      assert(PlanAudit.kernelFilterFlag(badPlan),
        s"gate failed to flag the regressed plan:\n${badPlan.take(2000)}")
    } finally spark.conf.set("spark.sql.optimizer.excludedRules", saved)
  }
}

package graft

/** Dev-only: does a scalar kernel projection over the spread view stay
  * ABOVE the round-robin repartition exchange, or does the optimizer
  * transpose it below (serializing the kernel into the scan task)?
  */
object KernelPlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("kernel-plan-probe")
    Tables.embeddingsDense(spark, sf).createOrReplaceTempView("embeddings")
    val df = spark.sql(
      "SELECT vec_id, sign_lsh_buckets(embedding, 4, 8, 'q2:') AS bks FROM embeddings")
    println("===== optimized =====")
    println(df.queryExecution.optimizedPlan.treeString)
    println("===== physical =====")
    println(df.queryExecution.executedPlan.treeString)
    spark.stop()
  }
}

package graft.queries

import org.apache.spark.sql.functions._

/** Dev-only: dump the FORCED-split e05 result + both engine SQL strings on
  * the SemDedupCapSpec synthetic corpus, for a cross-engine DuckDB compare
  * (the committed oracle only exercises the inactive-cap path at test SF).
  * Usage: Test/runMain graft.queries.SemCapDump /tmp/semcap
  */
object SemCapDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/semcap")
    val spark = graft.GraftSession.get("semcap-dump")
    import spark.implicits._
    val rows = (0 until 400).map { id =>
      val v: Array[Float] =
        if (id < 300) Array.tabulate(8)(i =>
          (if (i == 0) 10f else 0f) + ((id * 31 + i * 7) % 13 - 6) * 0.01f)
        else Array.tabulate(8)(i => ((id * 17 + i * 5) % 19 - 9) * 1.0f)
      (id.toLong, v, s"lbl${id % 4}")
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    df.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    df.createOrReplaceTempView("embeddings")
    spark.sql(VectorQueries.semanticDedupSql(spark = true, capExpr = "8"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/spark_result")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/duck.sql"),
      VectorQueries.semanticDedupSql(spark = false, capExpr = "8"))
    spark.stop()
  }
}

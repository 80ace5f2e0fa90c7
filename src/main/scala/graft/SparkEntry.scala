package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2 + the
  * training-data pipeline pack) to a DataFrame program over the testdata
  * tables; `oracleSql` carries the DuckDB-equivalent SQL the driver
  * hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q04_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracle),
      (CawdQueries.queries, CawdQueries.oracle),
      (TextQueries.queries, TextQueries.oracle),
      (VectorQueries.queries, VectorQueries.oracle),
      (MediaQueries.queries, MediaQueries.oracle),
      (StreamingQueries.queries, StreamingQueries.oracle)
    )

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * CACHE CONTRACT: a query may `cache()` relations its plan reuses across
    * branches (LSH candidate sets, shingle tables). Callers that run many
    * queries in one session should `spark.catalog.clearCache()` after
    * materializing each result — [[Verify]] and [[Bench]] do — or the cached
    * relations accumulate for the life of the session.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}

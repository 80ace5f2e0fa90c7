package graft

/** Dev-only: print e02's adaptive (np, nb) for a corpus — sanity check that
  * the fitted band schedule actually changes the table count at scale.
  */
object E02NbProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("e02-nb-probe")
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings")
    spark.sql(
      """SELECT np,
        |  greatest(16 + 8 * greatest(0, np - 4),
        |           CAST(ceil(113.0 * power(1.25, np - 16) - 1e-9) AS INT)) AS nb,
        |  n
        |FROM (SELECT least(24, greatest(4,
        |        CAST(ceil(log2(count(*) / 32.0)) AS INT))) AS np,
        |        count(*) AS n
        |      FROM embeddings) t""".stripMargin).show()
    spark.stop()
  }
}

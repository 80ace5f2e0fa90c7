package graft

import org.apache.spark.sql.functions._

/** Dev-only: decompose d14's fifth-decade cost (232.9 s at 1000× for a
  * 5-row answer — BENCH_sf100_full) before picking the cut. Stages:
  *   (1) narrow 3-gram explode + md5 (no shuffle) — the hash-over-text
  *       term;
  *   (2) DISTINCT (lang, h) — adds the corpus-wide distinct shuffle;
  *   (3) full query — adds the per-lang window rank (PARTITION BY lang
  *       ORDER BY h over every distinct shingle: lang cardinality is tiny,
  *       so this sorts tens of millions of rows in a handful of tasks —
  *       the suspected serial term).
  *
  * Usage: Test/runMain graft.D14Probe [corpusDir]
  */
object D14Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf10-r7")
    val spark = GraftSession.get("d14-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d14] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    Tables.documents(spark, d).createOrReplaceTempView("documents")
    val sh = spark.sql(
      """SELECT lang, md5(s) AS h
        |FROM (SELECT lang, explode(CASE WHEN size(w) >= 3 THEN
        |    array_distinct(transform(sequence(1, size(w) - 2),
        |      i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),
        |                          element_at(w, i + 2))))
        |  ELSE array() END) AS s
        |  FROM (SELECT lang, split(text, ' ') AS w FROM documents) ww) x""".stripMargin)
    val nRaw = time("d14.1 narrow explode+md5 (count)")(sh.count())
    println(s"[d14] n_raw = $nRaw")
    val nDist = time("d14.2 distinct(lang,h) (shuffle)")(sh.distinct().count())
    println(s"[d14] n_distinct = $nDist")
    time("d14.3 full query (window kth-min)")(
      SparkEntry.queries("d14_vocab_kmv_sketch")(spark, d).collect())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev-only: decompose d05's cost at a given corpus — the D22Probe pattern.
  * Stages: (1) ranked-shingle export read, (2) PPJoin candidate join,
  * (3) candidate-restricted verify join, (4) the full persisted-table path
  * the query itself takes (build on first run, table read after).
  */
object D05Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf10-r7")
    val spark = GraftSession.get("d05-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d05] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val ranked = time("ranked shingles (persisted export)")(
      queries.TextQueries.rankedShingles(spark, d))
    time("ranked full read (count)")(println(s"[d05] n_shingle_rows = ${ranked.count()}"))
    val cands = queries.TextQueries.ppjoinCandidates(ranked).cache()
    val nc = time("candidate join (count)")(cands.count())
    println(s"[d05] n_candidates = $nc")
    // verify join alone over the cached candidate set — the residual d05
    // pays after candidates: two semi prunes + shingle-match join + agg
    time("verify join (common counts)") {
      val shA = ranked.join(
        cands.select(col("ida").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      val shB = ranked.join(
        cands.select(col("idb").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      shA.as("x")
        .join(shB.as("y"),
          col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
        .join(cands,
          col("x.doc_id") === cands("ida") && col("y.doc_id") === cands("idb"),
          "left_semi")
        .groupBy(col("x.doc_id"), col("y.doc_id"))
        .agg(count(lit(1)).as("common"))
        .agg(sum("common")).collect()
    }
    // the query's own path: persisted-table build on a cold corpus, pure
    // parquet read on a warm one — run twice to show both
    time("d05 full (persisted path, 1st)")(
      println(s"[d05] n_pairs = ${SparkEntry.queries("d05_ngram_jaccard_pairs")(spark, d).count()}"))
    time("d05 full (persisted path, 2nd)")(
      SparkEntry.queries("d05_ngram_jaccard_pairs")(spark, d).count())
    spark.stop()
  }
}

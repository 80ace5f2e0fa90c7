package graft

import org.apache.spark.sql.functions._

/** Dev-only: decompose d15/d17's fifth-decade superlinearity (14.2×/14.5×
  * on 10× data, BENCH_sf10_full_r9 vs BENCH_sf100_full) — the D05Probe
  * pattern. Run at BOTH corpora and compare per-stage growth; the stage
  * whose ratio matches the query's overall ratio is the superlinear term.
  *
  * Stages, chosen to split the two suspects the round-9 verdict named
  * (shingle-explode shuffle vs bloom build):
  *   d15: (1) narrow explode count (no shuffle — isolates tokenize+
  *        5-gram construction), (2) DISTINCT (doc_id,source,s) count (adds
  *        exactly the corpus-wide distinct shuffle), (3) bench-side
  *        distinct, (4) full query.
  *   d17: (5) bloom build alone (bench distinct + count + bloom agg),
  *        (6) bloom prefilter survivor count (narrow re-explode + bit-test,
  *        no shuffle), (7) full query (adds semi-join + dedup + rollup).
  *
  * Usage: Test/runMain graft.D1517Probe [corpusDir]
  */
object D1517Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf10-r7")
    val spark = GraftSession.get("d1517-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d1517] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, d)
    docs.createOrReplaceTempView("documents")
    val sh5 = queries.TextQueries.shingle5Expr
    val ex = docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), expr(sh5).as("ss"))
      .select(col("doc_id"), col("source"), explode(col("ss")).as("s"))

    // --- d15 stages ---
    val nRaw = time("d15.1 narrow explode (count, no shuffle)")(ex.count())
    println(s"[d1517] n_raw_shingles = $nRaw")
    val nDist = time("d15.2 distinct(doc,source,s) (shuffle)")(ex.distinct().count())
    println(s"[d1517] n_distinct_rows = $nDist")
    val nBench = time("d15.3 bench shingle distinct")(
      ex.filter(col("source") === "src0").select("s").distinct().count())
    println(s"[d1517] n_bench_shingles = $nBench")
    time("d15.4 full query (agg count)")(
      println("[d1517] d15_rows = " +
        SparkEntry.queries("d15_decontamination")(spark, d).count()))

    // --- d17 stages (over the dense spread, matching the real query) ---
    val exd = Tables.documentsDense(spark, d)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), expr(sh5).as("ss"))
      .select(col("doc_id"), col("source"), explode(col("ss")).as("s"))
    val bench = exd.filter(col("source") === "src0").select(col("s").as("s5")).distinct()
    val (bloomBytes, nItems) = time("d17.5 bloom build (distinct+count+agg)") {
      val n = math.max(bench.count(), 1L)
      val nBits = math.max(64L,
        math.ceil(-n * math.log(0.03) / (math.log(2) * math.log(2))).toLong)
      (bench.agg(call_function("graft_bloom_agg", xxhash64(col("s5")),
        lit(n), lit(nBits)).as("bf")).head().getAs[Array[Byte]]("bf"), n)
    }
    println(s"[d1517] bloom_bytes = ${bloomBytes.length} over $nItems items")
    val nSurv = time("d17.6 bloom prefilter survivors (narrow)")(
      exd.filter(col("source") =!= "src0")
        .filter(call_function("graft_might_contain",
          lit(bloomBytes), xxhash64(col("s")))).count())
    println(s"[d1517] n_bloom_survivors = $nSurv")
    time("d17.7 full query")(
      SparkEntry.queries("d17_bloom_decontamination")(spark, d).collect())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev-only: decompose d22's cost at a given corpus — candidate-pair count,
  * join cost without the DP, and the DP-bearing full query.
  */
object D22Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf10-r7")
    val spark = GraftSession.get("d22-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d22] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val df = graft.Tables.documents(spark, d)
    // round 8: the query reads the persisted per-corpus band table — time
    // the warm path (export already on disk) like the query pays it
    val bands = time("bands (persisted export)")(
      queries.TextQueries.minhashBandsOf(spark, d))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb")).distinct()
      .cache()
    val nc = time("candidate pairs (count)")(cands.count())
    println(s"[d22] n_candidates = $nc")
    val texts = df.select(col("doc_id"), col("text"))
    val joined = cands
      .join(texts.as("ta"), col("ida") === col("ta.doc_id"))
      .join(texts.as("tb"), col("idb") === col("tb.doc_id"))
    time("join only (md5 stand-in)")(
      joined.select(md5(concat(col("ta.text"), col("tb.text"))).as("h"))
        .agg(count(col("h"))).collect())
    time("join + 1x banded lev")(
      joined.select(expr(
        """levenshtein(ta.text, tb.text, CAST(floor(
          |0.2 * greatest(length(ta.text), length(tb.text))) AS INT) + 1)"""
          .stripMargin).as("v")).agg(sum(col("v"))).collect())
    time("join + 1x full lev")(
      joined.select(expr("levenshtein(ta.text, tb.text)").as("v"))
        .agg(sum(col("v"))).collect())
    val lens = df.agg(avg(length(col("text"))), max(length(col("text")))).head()
    println(s"[d22] avg_len=${lens.get(0)} max_len=${lens.get(1)}")
    spark.stop()
  }
}

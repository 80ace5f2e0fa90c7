package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftSession, SparkEntry, Tables}

/** Round-11 decontamination rewrite: d15/d17 now read a PERSISTED
  * benchmark shingle set, prefilter with a PERSISTED serialized bloom,
  * and verify with an exact semi-join. Blooms have no false negatives and
  * the semi-join removes false positives, so both must equal the plain
  * exact inverted-index derivation — this spec recomputes that derivation
  * inline (no persistence, no bloom) and compares row-for-row, so a
  * stale-content-key bug, a bloom built over the wrong hash, or a
  * dropped-distinct regression fails in `sbt test` without the oracle.
  */
class DecontamParitySpec extends AnyFunSuite {

  private val d = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("d15/d17 persisted-bloom paths equal the exact inverted-index join") {
    val spark = GraftSession.get("decontam-parity-spec")
    val sh = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"),
        explode(expr(TextQueries.shingle5Expr)).as("s5"))
      .distinct()
    val bench = sh.filter(col("source") === "src0").select("s5").distinct()
    val hits = sh.filter(col("source") =!= "src0").join(bench, Seq("s5"))

    val exactD15 = hits.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_shared_shingles"))
    val gotD15 = SparkEntry.queries("d15_decontamination")(spark, d)
    assert(rows(gotD15) == rows(exactD15),
      "d15 persisted-bloom result != exact inverted-index derivation")
    assert(gotD15.count() > 0, "d15 parity check is vacuous (no overlap rows)")

    val exactD17 = hits.groupBy(col("source")).agg(
      countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("n_hits"),
      countDistinct(col("s5")).as("n_distinct_shingles"))
    val gotD17 = SparkEntry.queries("d17_bloom_decontamination")(spark, d)
    assert(rows(gotD17) == rows(exactD17),
      "d17 persisted-bloom result != exact inverted-index derivation")
  }
}

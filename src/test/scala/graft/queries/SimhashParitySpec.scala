package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Pins the native `simhash_fp` kernel to the relational SimHash SQL it
  * replaced on the Spark side (the oracle's DuckDB variant of the same
  * formulation remains the cross-engine check at sf0.01): identical
  * (doc_id, b0..b3) rows on a real corpus AND on hand-built edge cases —
  * empty text, consecutive/leading/trailing spaces (empty tokens kept),
  * repeated tokens (tf weighting), multi-byte UTF-8, and a zero bit-sum
  * (strict `> 0` must clear the bit).
  */
class SimhashParitySpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get("simhash-parity-spec")

  private def both(): (Array[String], Array[String]) = {
    val rel = spark.sql(TextQueries.simhashSql(spark = true))
      .orderBy("doc_id").collect().map(_.toString)
    // the same kernel projection simhashesOf's export build runs
    val nat = spark.sql(
      """SELECT doc_id, sh[0] AS b0, sh[1] AS b1, sh[2] AS b2, sh[3] AS b3
        |FROM (SELECT doc_id, simhash_fp(text) AS sh FROM documents) t"""
        .stripMargin)
      .orderBy("doc_id").collect().map(_.toString)
    (rel, nat)
  }

  test("kernel == relational SQL on sf0.001 documents") {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
    val (rel, nat) = both()
    assert(rel.length > 0 && rel.sameElements(nat))
  }

  test("kernel == relational SQL on edge cases") {
    import spark.implicits._
    Seq(
      (1L, ""),                       // one empty token
      (2L, "  a  b "),                // empty tokens kept at ends/middles
      (3L, "x x x y"),                // tf weighting
      (4L, "héllo wörld héllo"),      // multi-byte UTF-8 tokens
      (5L, "a b")                     // two singletons: many zero bit-sums
    ).toDF("doc_id", "text").createOrReplaceTempView("documents")
    val (rel, nat) = both()
    assert(rel.length == 5 && rel.sameElements(nat))
  }
}

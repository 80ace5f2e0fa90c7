package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** The native winnow_fp expression must compute EXACTLY what the shared
  * SQL definition computes (md5 per char 8-gram, window-4 min, distinct
  * count + global min) — cross-checked here on randomized strings,
  * including the sub-8-char and empty edge cases, plus multi-byte UTF-8
  * (substr is character-based in both the expression and SQL).
  */
class WinnowFingerprintSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get("winnow-spec")

  private def viaSql(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").createOrReplaceTempView("wtest")
    spark.sql(
      """WITH grams AS (
        |  SELECT doc_id,
        |    transform(sequence(1, greatest(length(text) - 7, 1)),
        |              i -> md5(substr(text, CAST(i AS INT), 8))) AS g
        |  FROM wtest),
        |wins AS (
        |  SELECT doc_id,
        |    transform(g, (x, j) -> array_min(slice(g, j + 1, 4))) AS fps
        |  FROM grams)
        |SELECT doc_id, CAST(size(array_distinct(fps)) AS BIGINT) AS n,
        |       array_min(fps) AS mn
        |FROM wins ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
  }

  private def viaExpr(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), WinnowFingerprint(col("text")).as("fp"))
      .select(col("doc_id"), col("fp.n_fingerprints"), col("fp.min_fingerprint"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
  }

  test("native expression matches the SQL formulation on random strings") {
    val rnd = new scala.util.Random(7)
    // code-point alphabet including a supplementary-plane char (😀, a UTF-16
    // surrogate pair): SQL substr/length count it as 1, so the expression
    // must iterate by code point, not by Java char
    val alphabet = Seq("a", "b", " ", "c", "d", "é", "中", "!", "😀")
    val texts = Seq("", "a", "1234567", "12345678", "123456789",
      "😀" * 9, "ab😀cd😀efgh") ++
      Seq.fill(40)(Seq.fill(rnd.nextInt(120))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    assert(viaExpr(texts).toSeq == viaSql(texts).toSeq)
  }

  test("winnow_fp_set: sorted distinct set consistent with the summary and SQL") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val alphabet = Seq("a", "b", " ", "c", "d", "é", "!")
    val texts = Seq("", "12345678", "abcabcabcabc") ++
      Seq.fill(20)(Seq.fill(rnd.nextInt(100))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").createOrReplaceTempView("wset")
    val rows = spark.sql(
      """SELECT doc_id, winnow_fp_set(text) AS s, winnow_fp(text) AS fp
        |FROM wset""".stripMargin).collect()
    rows.foreach { r =>
      val set = r.getSeq[String](1)
      assert(set == set.sorted && set.distinct == set, "sorted, distinct")
      assert(set.size.toLong == r.getStruct(2).getLong(0), "size == summary count")
      assert(set.head == r.getStruct(2).getString(1), "first == min fingerprint")
    }
    // cross-check membership against the SQL formulation's distinct set
    val sql = spark.sql(
      """WITH grams AS (
        |  SELECT doc_id,
        |    transform(sequence(1, greatest(length(text) - 7, 1)),
        |              i -> md5(substr(text, CAST(i AS INT), 8))) AS g
        |  FROM wset)
        |SELECT doc_id,
        |  array_sort(array_distinct(
        |    transform(g, (x, j) -> array_min(slice(g, j + 1, 4))))) AS fps
        |FROM grams""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach(r => assert(r.getSeq[String](1) == sql(r.getLong(0))))
  }

  test("works from SQL and stays a codegen'd narrow projection") {
    import spark.implicits._
    // parquet-backed (a LOCAL relation collapses to LocalTableScan with no
    // WholeStageCodegen regardless of the expression — not what we assert)
    val dir = java.nio.file.Files.createTempDirectory("winnow-spec").toFile
    dir.deleteOnExit()
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/t")
    spark.read.parquet(s"${dir.getAbsolutePath}/t").createOrReplaceTempView("wtest2")
    val df = spark.sql(
      "SELECT doc_id, winnow_fp(text).n_fingerprints AS n FROM wtest2")
    // whole-stage-codegen membership renders as a "*(n) " stage prefix in
    // the physical plan string; an interpreted fallback would drop it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen'd projection:\n$plan")
    assert(df.collect().head.getLong(1) > 0)
  }
}

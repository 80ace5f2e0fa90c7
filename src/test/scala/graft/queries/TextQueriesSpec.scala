package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Unit coverage for the span-dedup / split / retrieval text operators —
  * semantics on a corpus small enough to reason about by hand (the oracle
  * gate at sf0.01 covers the full-corpus values).
  */
class TextQueriesSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get("text-queries-spec")

  /** Ten-token spans A/B/C as text building blocks for d21. */
  private val A = (1 to 10).map(i => s"a$i").mkString(" ")
  private val B = (1 to 10).map(i => s"b$i").mkString(" ")
  private val C = (1 to 10).map(i => s"c$i").mkString(" ")

  private lazy val docsDir: String = {
    val dir = Files.createTempDirectory("graft-textspec").toFile
    dir.deleteOnExit()
    import spark.implicits._
    // doc 1 = A B; doc 2 = A C (A is a cross-doc dup); doc 3 = C C
    // (C first occurs in doc 2; doc 3's repeat must vanish ENTIRELY)
    Seq(
      (1L, s"$A $B", "en", "web"),
      (2L, s"$A $C", "en", "web"),
      (3L, s"$C $C", "en", "books")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    dir.getAbsolutePath
  }

  test("d21 keeps only the global first occurrence of each span") {
    val out = TextQueries.queries("d21_line_dedup")(spark, docsDir)
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_kept", "kept_hash")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hash(s: String): String =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0) == (1L, 2L, 2L, hash(s"$A $B"))) // doc 1 keeps everything
    assert(out(1) == (2L, 2L, 1L, hash(C)))        // A deduped, C survives
    assert(out(2) == (3L, 2L, 0L, hash("")))       // both repeats vanish
    spark.catalog.clearCache()
  }

  test("d21 edge cases: partial spans, identical docs, within-doc repeats") {
    val dir = Files.createTempDirectory("graft-textspec-edge").toFile
    dir.deleteOnExit()
    import spark.implicits._
    val short = "w1 w2 w3 w4 w5" // 5 tokens: one PARTIAL span
    val twenty5 = (1 to 25).map(i => s"t$i").mkString(" ") // 2 full + 1 partial
    Seq(
      (1L, short, "en", "web"),
      (2L, short, "en", "web"),     // byte-identical doc: fully deduped
      (3L, twenty5, "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val out = TextQueries.queries("d21_line_dedup")(spark, dir.getAbsolutePath)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out(0) == (1L, 1L, 1L), "5-token doc is ONE partial span, kept")
    assert(out(1) == (2L, 1L, 0L), "identical later doc loses its only span")
    assert(out(2) == (3L, 3L, 3L), "25 tokens = 2 full + 1 partial, all first")
    spark.catalog.clearCache()
  }

  test("d23 split is total, deterministic, and in-range") {
    val q = TextQueries.queries("d23_train_val_split")
    val a = q(spark, docsDir).collect().map(_.toSeq).toSet
    val b = q(spark, docsDir).collect().map(_.toSeq).toSet
    assert(a == b, "same corpus must split identically on rerun")
    assert(a.size == 3)
    a.foreach { row =>
      val key = row(2).asInstanceOf[Double]
      assert(key >= 0.0 && key < 1.0)
      assert(Set("train", "val", "test")(row(3).asInstanceOf[String]))
    }
  }

  test("d24 top-k plans as TakeOrderedAndProject, never a global sort") {
    val df = TextQueries.queries("d24_bm25_topk")(spark, docsDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"),
      s"expected heap-based top-k, got:\n$physical")
    val rows = df.collect()
    assert(rows.length <= 20)
    // scores arrive in (bm25 DESC, doc_id ASC) order
    val scores = rows.map(r => (-r.getDouble(1), r.getLong(0))).toSeq
    assert(scores == scores.sorted)
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

class NfcNormalizeSpec extends AnyFunSuite {

  test("native nfc_normalize composes, is idempotent, handles nulls, works from SQL") {
    val spark = GraftSession.get("nfc-spec")
    import spark.implicits._

    val decomposed = "e\u0301cole"  // e + combining acute
    val composed = "\u00e9cole"     // precomposed e-acute
    val df = Seq(
      (1L, decomposed),
      (2L, composed),
      (3L, "plain ascii"),
      (4L, "A\u030a ring")          // A + combining ring above
    ).toDF("id", "s")

    val rows = df.select(col("id"), NfcNormalize(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1) == composed)       // composition happened
    assert(rows(2) == composed)       // idempotent on already-NFC input
    assert(rows(3) == "plain ascii")  // ASCII fast path
    assert(rows(4) == "\u00c5 ring") // precomposed A-ring

    // composition shortens the code-point length
    val lens = df.filter(col("id") === 1)
      .select(length(col("s")), length(NfcNormalize(col("s")))).head()
    assert(lens.getInt(0) == 6 && lens.getInt(1) == 5)

    // SQL registration via GraftExtensions
    df.createOrReplaceTempView("nfc_v")
    assert(spark.sql("SELECT nfc_normalize(s) FROM nfc_v WHERE id = 1")
      .head().getString(0) == composed)

    // null in -> null out
    assert(Seq((1L, null: String)).toDF("id", "s")
      .select(NfcNormalize(col("s"))).head().isNullAt(0))

    // wrong arity from SQL -> analysis error
    val err = intercept[Exception](
      spark.sql("SELECT nfc_normalize(s, s) FROM nfc_v"))
    assert(err.getMessage.toLowerCase.contains("nfc_normalize"))
  }
}

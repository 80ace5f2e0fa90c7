package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** The norm-factored cosine (dot_product + precomputed norms — the form
  * the N·C IVF scoring and pair-quadratic e05 run) must be BIT-IDENTICAL
  * to the fused cosine_sim kernel, not merely close: a last-ulp divergence
  * at a 6-decimal rounding boundary would flip a cell assignment and
  * cascade through the trained index. The argument is structural — same
  * left-to-right accumulation, same `dot / (sqrt(na) * sqrt(nb))` double
  * expression — and this spec pins it on deterministic pseudo-random
  * vectors plus adversarial near-boundary cases.
  */
class CosineParitySpec extends AnyFunSuite {

  test("factored dot/norm cosine is bit-equal to cosine_sim; nulls align") {
    val spark = GraftSession.get("cosine-parity-spec")
    import spark.implicits._

    // deterministic LCG floats in [-1, 1), dim 64, plus edge vectors
    def vec(seed: Long): Array[Float] = {
      var s = seed
      Array.fill(64) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 33).toInt / ((1L << 31).toDouble)).toFloat
      }
    }
    val zero = Array.fill(64)(0.0f)
    val pairs =
      (1L to 200L).map(i => (i, vec(i), vec(i * 31 + 7))) ++
        Seq((201L, vec(5), vec(5)),            // identical → exactly 1 region
          (202L, zero, vec(9)),                // zero norm → null
          (203L, vec(9), zero))                // zero norm (other side) → null
    val df = pairs.toDF("id", "a", "b")
    df.createOrReplaceTempView("pp")

    val rows = spark.sql(
      """SELECT id, cosine_sim(a, b) AS fused,
        |  dot_product(a, b) / nullif(
        |    sqrt(dot_product(a, a)) * sqrt(dot_product(b, b)), 0) AS factored
        |FROM pp""".stripMargin).collect()
    assert(rows.length == pairs.length)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch at id=$id")
      else {
        // bitwise, not epsilon: the whole point of the factored form
        val f = java.lang.Double.doubleToRawLongBits(r.getDouble(1))
        val g = java.lang.Double.doubleToRawLongBits(r.getDouble(2))
        assert(f == g, s"id=$id fused=${r.getDouble(1)} factored=${r.getDouble(2)}")
      }
    }

    // dot_product alone vs the HOF fold (same accumulation order)
    val dots = spark.sql(
      """SELECT dot_product(a, b) AS native,
        |  aggregate(zip_with(a, b, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
        |    CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS hof
        |FROM pp WHERE id <= 200""".stripMargin).collect()
    dots.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }

    // length mismatch → null (matches cosine_sim)
    val mm = spark.sql(
      "SELECT dot_product(array(CAST(1.0 AS FLOAT)), a) FROM pp WHERE id = 1")
      .head()
    assert(mm.isNullAt(0))
  }
}

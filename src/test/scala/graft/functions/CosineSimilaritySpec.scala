package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

class CosineSimilaritySpec extends AnyFunSuite {

  test("native cosine_sim matches the HOF formulation, handles nulls, works from SQL") {
    val spark = GraftSession.get("cosine-spec")
    import spark.implicits._

    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),   // identical → 1.0
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),               // orthogonal → 0.0
      (3L, Array(0.5f, -0.25f, 2.0f), Array(-1.5f, 0.75f, 0.1f))
    ).toDF("id", "a", "b")

    def hof(x: String, y: String) = expr(
      s"""aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v) /
         |(sqrt(aggregate(transform($x, p -> CAST(p AS DOUBLE) * CAST(p AS DOUBLE)),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)) *
         | sqrt(aggregate(transform($y, p -> CAST(p AS DOUBLE) * CAST(p AS DOUBLE)),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)))""".stripMargin)

    val rows = df.select(col("id"),
      CosineSimilarity(col("a"), col("b")).as("native"),
      hof("a", "b").as("ref")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
        s"id=${r.getLong(0)}")
    }
    assert(math.abs(rows.find(_.getLong(0) == 1).get.getDouble(1) - 1.0) < 1e-12)

    // SQL registration via GraftExtensions
    df.createOrReplaceTempView("v")
    val viaSql = spark.sql("SELECT cosine_sim(a, b) FROM v WHERE id = 2")
      .head().getDouble(0)
    assert(math.abs(viaSql) < 1e-12)

    // null / mismatched-length / zero-norm handling → null, never NaN
    val edge = Seq(
      (Some(Array(1.0f)), None: Option[Array[Float]]),
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])),
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 2.0f)))
    ).toDF("a", "b")
    val vals = edge.select(CosineSimilarity(col("a"), col("b"))).collect()
    assert(vals.forall(_.isNullAt(0)))

    // wrong arity from SQL → analysis error, not IndexOutOfBounds
    val err = intercept[Exception](spark.sql("SELECT cosine_sim(a) FROM v"))
    assert(err.getMessage.toLowerCase.contains("cosine_sim"))
    assert(!err.isInstanceOf[IndexOutOfBoundsException])
  }
}

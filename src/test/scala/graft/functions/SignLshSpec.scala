package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** The native `sign_lsh_buckets` kernel must reproduce the relational
  * sign-LSH formulation (the one the DuckDB oracle still runs) bucket-for-
  * bucket: same md5-seeded hyperplane weights, same round-6 sign test,
  * same band bit packing — on random vectors, including dimensions below
  * the 64-wide plane table.
  */
class SignLshSpec extends AnyFunSuite {

  private def relationalSql(np: Int, nb: Int, seed: String): String = {
    val planes = np * nb
    s"""WITH flat AS (
       |  SELECT vec_id, i, CAST(element_at(embedding, CAST(i AS INT)) AS DOUBLE) AS x
       |  FROM vecs LATERAL VIEW explode(sequence(1, size(embedding))) t AS i),
       |planes AS (
       |  SELECT CAST(floor(k / 64.0) AS INT) AS p, (k % 64) + 1 AS i,
       |    (instr('0123456789abcdef',
       |       substr(md5('$seed' || CAST(CAST(floor(k / 64.0) AS INT) AS STRING) || ':' ||
       |                  CAST((k % 64) + 1 AS STRING)), 1, 1)) - 1) - 7.5 AS w
       |  FROM (SELECT explode(sequence(0, ${planes * 64 - 1})) AS k) kk),
       |signs AS (
       |  SELECT vec_id, p, CASE WHEN round(sum(x * w), 6) > 0 THEN 1 ELSE 0 END AS b
       |  FROM flat JOIN planes USING (i) GROUP BY vec_id, p),
       |bb AS (
       |  SELECT vec_id, CAST(floor(p / $np.0) AS INT) AS band,
       |    CAST(sum(shiftleft(b, CAST(p % $np AS INT))) AS BIGINT) AS bucket
       |  FROM signs GROUP BY vec_id, CAST(floor(p / $np.0) AS INT))
       |SELECT vec_id, band, bucket FROM bb""".stripMargin
  }

  private def check(dims: Int, np: Int, nb: Int, seed: String): Unit = {
    val spark = GraftSession.get("signlsh-spec")
    import spark.implicits._
    val rnd = new scala.util.Random(dims * 31 + np)
    Seq.tabulate(40)(id =>
      (id.toLong, Array.fill(dims)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("vecs")
    val rel = spark.sql(relationalSql(np, nb, seed))
      .as[(Long, Int, Long)].collect().toSet
    val nat = spark.sql(
      s"""SELECT vec_id, band, bucket
         |FROM (SELECT vec_id,
         |        sign_lsh_buckets(embedding, $np, $nb, '$seed') AS bks
         |      FROM vecs) e
         |LATERAL VIEW posexplode(bks) t AS band, bucket""".stripMargin)
      .as[(Long, Int, Long)].collect().toSet
    assert(nat == rel, s"dims=$dims np=$np nb=$nb")
    assert(nat.size == 40 * nb)
  }

  test("native buckets equal the relational formulation (64-dim)") {
    check(dims = 64, np = 5, nb = 6, seed = "t:")
  }

  test("native buckets equal the relational formulation (sub-64-dim, wide bands)") {
    check(dims = 32, np = 12, nb = 4, seed = "q2:")
  }
}

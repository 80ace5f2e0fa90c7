package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.spread]]'s two load-bearing properties: the dense entry
  * points put a CPU-dense stage on every core even when the compressed
  * input is a single scan split (the sf10 single-task trap, SCALE.md
  * §sf10), and the repartition is a pure re-distribution — same rows.
  */
class SpreadSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("documentsDense parallelism follows rows, not parquet bytes") {
    val spark = GraftSession.get("spread-spec")
    val base = Tables.documents(spark, sf)
    val dense = Tables.documentsDense(spark, sf)
    val p = dense.rdd.getNumPartitions
    assert(p >= spark.sparkContext.defaultParallelism,
      s"dense entry got $p partitions — a dense stage would underuse the cores")
    assert(p <= 64 * spark.sparkContext.defaultParallelism,
      s"$p partitions — scheduler overhead cap breached")
    assert(dense.count() === base.count())
  }

  test("spread preserves the exact row multiset") {
    val spark = GraftSession.get("spread-spec")
    import org.apache.spark.sql.functions._
    val base = Tables.embeddings(spark, sf)
    val dense = Tables.embeddingsDense(spark, sf)
    val a = base.select(sum(hash(col("vec_id"))), count(lit(1))).head()
    val b = dense.select(sum(hash(col("vec_id"))), count(lit(1))).head()
    assert(a === b)
  }
}

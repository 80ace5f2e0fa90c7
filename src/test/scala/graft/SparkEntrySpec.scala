package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract: `entry` must return rows (the driver's smoke
  * check), and every query has BOTH halves of its correctness story — the
  * DataFrame program and, for the hash-compare, a DuckDB oracle.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("entry returns rows on the smoke corpus") {
    val spark = GraftSession.get("entry-spec")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query carries an oracle (and no oracle is orphaned)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
    assert(q.size == 68)
  }
}

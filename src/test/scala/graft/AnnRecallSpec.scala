package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ANN quality gate as a unit test: every approximate index must stay
  * above its committed recall floor against the exact e01 baseline on the
  * smoke corpus. Determinism (the oracle) can't see index QUALITY — this
  * is what fails if an index degenerates while still computing what it
  * says (the first run of the gate caught e02 at recall 0.04).
  */
class AnnRecallSpec extends AnyFunSuite {

  test("e02/e03/e07 recall@5 vs exact e01 stays above committed floors") {
    val spark = GraftSession.get("ann-recall-spec")
    val measured = Recall.measure(spark, "/root/testdata/sf0.001")
    measured.foreach { case (q, r) =>
      assert(r >= Recall.Floors(q),
        s"$q recall@${queries.VectorQueries.TopK} = $r below floor ${Recall.Floors(q)}")
    }
  }
}

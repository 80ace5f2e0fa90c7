package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Both physical strategies behind [[ConnectedComponents.minLabels]] must
  * produce identical min-label components; the reference is a third,
  * test-local union-find. Random graphs cover star/chain/clique mixes and
  * a 64-node chain pins the star loop's O(log n) convergence on the exact
  * shape diameter-bound propagation was worst at.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private def refLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
  }

  private def run(edges: Seq[(Long, Long)], star: Boolean): Map[Long, Long] = {
    val spark = GraftSession.get("cc-spec")
    import spark.implicits._
    val pairs = edges.toDF("ida", "idb")
    val out = if (star) ConnectedComponents.starLabelsForTest(pairs)
              else ConnectedComponents.minLabels(pairs)
    out.as[(Long, Long)].collect().toMap
  }

  test("driver union-find and star loop agree with reference on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val nNodes = 5 + rnd.nextInt(60)
      // ids far apart and unordered so min-labels aren't accidental
      val ids = Seq.fill(nNodes)(rnd.nextLong().abs % 1000000007L).distinct
      val nEdges = 1 + rnd.nextInt(2 * nNodes)
      val edges = Seq.fill(nEdges)(
        (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val expect = refLabels(edges)
        assert(run(edges, star = false) == expect, s"driver path, trial $trial")
        assert(run(edges, star = true) == expect, s"star path, trial $trial")
      }
    }
  }

  test("star loop collapses a 64-node chain (worst case for diameter-bound CC)") {
    val chain = (0L until 63L).map(i => (i * 17, (i + 1) * 17))
    val got = run(chain, star = true)
    assert(got.values.toSet == Set(0L), "every chain node labels to the minimum")
    assert(got.keySet == (0L until 64L).map(_ * 17).toSet)
  }

  test("empty edge list yields empty labels") {
    val spark = GraftSession.get("cc-spec")
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("ida", "idb")
    assert(ConnectedComponents.minLabels(empty).count() == 0)
  }
}

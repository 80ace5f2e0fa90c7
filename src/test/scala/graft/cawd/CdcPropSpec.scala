package graft.cawd

import org.scalatest.funsuite.AnyFunSuite

/** Property-style test (seeded randomized candidate lists): for ANY
  * candidate list and file length, the CDC cut selector must produce a
  * strictly-increasing total cover with bounded chunk sizes, and must be
  * insensitive to candidate order.
  */
class CdcPropSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("selectCuts covers [0, len) with bounded, increasing cuts") {
    for (_ <- 1 to 300) {
      val len = 1L + rnd.nextInt(500000)
      val n = rnd.nextInt(200)
      val cands = Seq.fill(n)(1L + rnd.nextInt(500000)).filter(_ <= len)
      val cuts = CdcChunker.selectCuts(cands, len)
      assert(cuts.last == len, s"cover ends at $len: $cuts")
      assert(cuts.head > 0)
      cuts.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b > a, "cuts strictly increasing")
          assert(b - a <= CdcChunker.MaxSize, "no chunk above MaxSize")
        case _ =>
      }
      assert(cuts.head <= CdcChunker.MaxSize)
      // every chunk except the tail honors the minimum size (selected cuts
      // sit >= MinSize past the previous cut; forced cuts at MaxSize)
      val sizes = (0L +: cuts).sliding(2).collect { case Seq(a, b) => b - a }.toSeq
      sizes.dropRight(1).foreach(sz =>
        assert(sz >= CdcChunker.MinSize, s"non-tail chunk $sz below MinSize"))
    }
  }

  test("selectCuts is deterministic and order-insensitive in candidates") {
    for (_ <- 1 to 100) {
      val len = 1L + rnd.nextInt(500000)
      val cands = Seq.fill(rnd.nextInt(100))(1L + rnd.nextInt(500000)).filter(_ <= len)
      assert(CdcChunker.selectCuts(cands, len) ==
        CdcChunker.selectCuts(rnd.shuffle(cands), len))
    }
  }
}

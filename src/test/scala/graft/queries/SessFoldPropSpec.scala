package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded randomized event streams) for s06's
  * per-user session fold ([[StreamingQueries.sessStep]]): against a
  * brute-force sessionizer, and — the property the streaming execution
  * actually depends on — invariance under chronological chunking (a
  * user's events arriving across many micro-batches, each batch sorted,
  * must fold to the same final state as one sorted pass).
  */
class SessFoldPropSpec extends AnyFunSuite {

  private val GapUs = 1800000000L
  private val rnd = new scala.util.Random(4242)

  private def fold(times: Seq[Long]): StreamingQueries.SessState =
    times.foldLeft(StreamingQueries.SessState(0L, 0L, 0L, 0L, 0L))(
      (st, us) => StreamingQueries.sessStep(st, us, GapUs))

  /** Brute force: split the SORTED times wherever the gap exceeds GapUs. */
  private def bruteSessions(sorted: Seq[Long]): Seq[Seq[Long]] =
    sorted.foldLeft(Vector.empty[Vector[Long]]) {
      case (acc, us) if acc.nonEmpty && us - acc.last.last <= GapUs =>
        acc.init :+ (acc.last :+ us)
      case (acc, us) => acc :+ Vector(us)
    }

  /** Event times: mixture of sub-gap deltas (same session), >gap jumps
    * (new session), and exact-gap boundaries (must stay SAME session —
    * the rule is strictly-greater).
    */
  private def genTimes(): Seq[Long] = {
    val n = rnd.nextInt(61)
    val deltas = Seq.fill(n)(rnd.nextInt(3) match {
      case 0 => rnd.nextLong(GapUs + 1)        // 0..gap inclusive
      case 1 => GapUs                          // exact boundary
      case _ => GapUs + 1 + rnd.nextLong(GapUs * 4)
    })
    deltas.scanLeft(1000000000000000L)(_ + _).drop(1)
  }

  test("fold matches brute-force sessionization") {
    for (_ <- 1 to 500) {
      val sorted = genTimes().sorted
      val st = fold(sorted)
      val sessions = bruteSessions(sorted)
      assert(st.nEvents == sorted.length)
      assert(st.nSessions == sessions.length)
      assert(math.max(st.maxLen, st.curLen) ==
        (if (sessions.isEmpty) 0L else sessions.map(_.length.toLong).max))
    }
  }

  test("chronological chunking cannot change the final state") {
    for (_ <- 1 to 500) {
      val sorted = genTimes().sorted
      val k = 1 + rnd.nextInt(5)
      val size = math.max(1, (sorted.length + k - 1) / k)
      val chunked = sorted.grouped(size).foldLeft(
        StreamingQueries.SessState(0L, 0L, 0L, 0L, 0L)) { (st, chunk) =>
        chunk.foldLeft(st)((s, us) => StreamingQueries.sessStep(s, us, GapUs))
      }
      assert(chunked == fold(sorted))
    }
  }

  test("out-of-order input fails loudly instead of corrupting counts") {
    val st = fold(Seq(1000L, 2000L)) // open session with lastUs = 2000
    val e = intercept[IllegalStateException] {
      StreamingQueries.sessStep(st, 1500L, GapUs)
    }
    assert(e.getMessage.contains("out-of-order"))
  }
}

package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded randomized event streams) for s03's
  * partition-local pre-fold ([[StreamingQueries.preFoldTypes]]): the
  * streaming execution splits the input arbitrarily across partitions AND
  * micro-batches, pre-folds each piece, and lets the stateful operator sum
  * the partials — so the invariant the query depends on is that any such
  * split folds to exactly the per-row totals. Unlike s06's fold this one
  * must hold for UNORDERED input (no chronological precondition): Long
  * addition is associative and commutative, and the spec exercises that
  * with shuffled streams, adversarial values (negative micros, Long
  * extremes that wrap identically on both paths), and degenerate splits.
  */
class TypeFoldPropSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1515)

  private def perRowTotals(rows: Seq[(String, Long)]): Map[String, (Long, Long)] =
    rows.groupBy(_._1).map { case (t, rs) =>
      t -> (rs.size.toLong, rs.map(_._2).sum)
    }

  /** Absorb pre-folded partials the way the stateful operator does. */
  private def absorb(parts: Seq[Seq[(String, Long)]]): Map[String, (Long, Long)] = {
    val st = scala.collection.mutable.Map.empty[String, (Long, Long)]
    parts.foreach { piece =>
      StreamingQueries.preFoldTypes(piece.iterator).foreach { case (t, n, us) =>
        val p = st.getOrElse(t, (0L, 0L))
        st.update(t, (p._1 + n, p._2 + us))
      }
    }
    st.toMap
  }

  private def genRows(): Seq[(String, Long)] = {
    val types = Seq("click", "view", "purchase", "scroll", "hover")
    val n = rnd.nextInt(200)
    Seq.fill(n)((types(rnd.nextInt(types.size)), rnd.nextInt(5) match {
      case 0 => -rnd.nextLong(1L << 40)        // negative micros
      case 1 => Long.MaxValue - rnd.nextLong(1000) // wraps the same both ways
      case _ => rnd.nextLong(1L << 40)
    }))
  }

  /** Split rows into k random contiguous pieces (some possibly empty). */
  private def randomSplit(rows: Seq[(String, Long)], k: Int): Seq[Seq[(String, Long)]] = {
    val cuts = Seq.fill(k - 1)(if (rows.isEmpty) 0 else rnd.nextInt(rows.size + 1))
      .sorted :+ rows.size
    cuts.foldLeft((0, Vector.empty[Seq[(String, Long)]])) {
      case ((from, acc), to) => (to, acc :+ rows.slice(from, to))
    }._2
  }

  test("any partition/micro-batch split of the pre-fold equals per-row totals") {
    for (_ <- 1 to 300) {
      val rows = rnd.shuffle(genRows())
      val k = 1 + rnd.nextInt(8)
      assert(absorb(randomSplit(rows, k)) == perRowTotals(rows))
    }
  }

  test("degenerate splits: empty input, all-empty pieces, one row per piece") {
    assert(absorb(Seq(Seq.empty, Seq.empty)) == Map.empty)
    val rows = genRows()
    assert(absorb(rows.map(Seq(_))) == perRowTotals(rows))
  }

  test("pre-fold emits at most one partial per distinct type") {
    for (_ <- 1 to 100) {
      val rows = genRows()
      val partials = StreamingQueries.preFoldTypes(rows.iterator).toSeq
      assert(partials.size == rows.map(_._1).distinct.size)
      assert(partials.map(_._1).distinct.size == partials.size)
    }
  }
}

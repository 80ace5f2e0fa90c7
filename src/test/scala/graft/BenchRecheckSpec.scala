package graft

import org.scalatest.funsuite.AnyFunSuite

/** The mover-recheck pass is committed measurement infrastructure — its
  * selection rules decide which rows of a 70-query artifact get an embedded
  * isolated re-measure, so the rules themselves are pinned here: the 30 %
  * ratio gate in BOTH directions, the 2 s absolute floor (sub-second rows
  * ratio-jitter freely), crash sentinels excluded on either side, top-N by
  * absolute delta, and prior-artifact parsing that degrades to empty
  * instead of failing the suite over its own bookkeeping.
  */
class BenchRecheckSpec extends AnyFunSuite {

  test("selects regressions AND recoveries past 30% ratio + 2s floor") {
    val prior = Map("up" -> 10.0, "down" -> 50.0, "flat" -> 40.0)
    val res = Seq("up" -> 20.0, "down" -> 30.0, "flat" -> 41.0)
    val m = Bench.selectMovers(res, prior)
    assert(m.map(_._1) == Seq("down", "up")) // sorted by |delta|: 20 then 10
    assert(m == Seq(("down", 50.0, 30.0), ("up", 10.0, 20.0)))
  }

  test("sub-second ratio jitter and small absolute moves are ignored") {
    val prior = Map("tiny" -> 0.2, "small" -> 10.0)
    // tiny: 3x ratio but 0.4 s delta; small: 2.5 s delta but ratio 1.25
    val res = Seq("tiny" -> 0.6, "small" -> 12.5)
    assert(Bench.selectMovers(res, prior).isEmpty)
  }

  test("boundary: exactly 30% or exactly 2s does not trigger (strict >)") {
    val prior = Map("ratio" -> 10.0, "abs" -> 10.0)
    val res = Seq("ratio" -> 13.0, "abs" -> 12.0)
    assert(Bench.selectMovers(res, prior).isEmpty)
  }

  test("crash sentinels and unknown queries are excluded") {
    val prior = Map("crashed_prior" -> -1.0, "ok" -> 10.0)
    val res = Seq("crashed_prior" -> 30.0, "ok" -> -1.0, "new_query" -> 99.0)
    assert(Bench.selectMovers(res, prior).isEmpty)
  }

  test("top-N by absolute delta caps the pass") {
    val prior = (1 to 8).map(i => s"q$i" -> 10.0).toMap
    val res = (1 to 8).map(i => s"q$i" -> (10.0 + 3 * i))
    val m = Bench.selectMovers(res, prior, n = 3)
    assert(m.map(_._1) == Seq("q8", "q7", "q6"))
  }

  test("prior parsing reads a real artifact line and degrades to empty") {
    val f = java.io.File.createTempFile("graft-bench-prior", ".json")
    try {
      java.nio.file.Files.write(f.toPath,
        """{"metric":"total","value":5.0,"queries":{"a":1.5,"b":-1},"sf":"x"}"""
          .getBytes("UTF-8"))
      assert(Bench.parsePriorQueries(f) == Map("a" -> 1.5, "b" -> -1.0))
      java.nio.file.Files.write(f.toPath, "not json".getBytes("UTF-8"))
      assert(Bench.parsePriorQueries(f).isEmpty)
      assert(Bench.parsePriorQueries(new java.io.File("/nonexistent")).isEmpty)
    } finally f.delete()
  }
}

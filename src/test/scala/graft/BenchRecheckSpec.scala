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
    // ratio: delta 3.0 passes the 2s floor, ratio exactly 1.3 fails strict >
    // abs: ratio 8/6 ≈ 1.33 passes the ratio gate, delta exactly 2.0 fails
    // strict > — each gate's strictness pinned in ISOLATION (round-15
    // advice: the old abs pair 10→12 also failed the ratio gate, so the
    // absolute floor's strictness was never actually exercised)
    val prior = Map("ratio" -> 10.0, "abs" -> 6.0)
    val res = Seq("ratio" -> 13.0, "abs" -> 8.0)
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

  test("standing: one-sided inflation past 30% ratio + 2s floor, sorted by delta") {
    val iso = Map("infl" -> 20.0, "big" -> 50.0, "fast" -> 30.0,
      "flat" -> 25.0, "crash" -> 10.0)
    val res = Seq(
      "infl" -> 32.0,  // 1.6x, +12 — flagged
      "big" -> 70.0,   // 1.4x, +20 — flagged, larger delta sorts first
      "fast" -> 18.0,  // 0.6x — FASTER than baseline: stale baseline, not debt
      "flat" -> 26.0,  // within noise
      "crash" -> -1.0, // sentinel excluded
      "nobase" -> 99.0) // not in the baseline map
    assert(Bench.selectStanding(res, iso) ==
      Seq(("big", 50.0, 70.0), ("infl", 20.0, 32.0)))
  }

  test("standing boundary: exactly 30% or exactly 2s does not trigger (strict >)") {
    // ratio: 13/10 = exactly 1.3 (delta 3 passes the floor)
    // abs: 8/6 ≈ 1.33 passes the ratio gate, delta exactly 2.0 fails
    val iso = Map("ratio" -> 10.0, "abs" -> 6.0)
    assert(Bench.selectStanding(Seq("ratio" -> 13.0, "abs" -> 8.0), iso).isEmpty)
  }

  test("sf field parsing reads the baseline's corpus tag and degrades to None") {
    val f = java.io.File.createTempFile("graft-bench-isobase", ".json")
    try {
      java.nio.file.Files.write(f.toPath,
        """{"sf":"graft-sf100-txt","queries":{"a":1.5}}""".getBytes("UTF-8"))
      assert(Bench.parseSfField(f).contains("graft-sf100-txt"))
      assert(Bench.parsePriorQueries(f) == Map("a" -> 1.5)) // same file parses
      java.nio.file.Files.write(f.toPath, """{"queries":{}}""".getBytes("UTF-8"))
      assert(Bench.parseSfField(f).isEmpty)
      assert(Bench.parseSfField(new java.io.File("/nonexistent")).isEmpty)
    } finally f.delete()
  }

  test("committed fifth-decade baseline file parses and names real queries") {
    val f = new java.io.File("bench/ISOLATED_graft-sf100-txt.json")
    assert(f.isFile)
    assert(Bench.parseSfField(f).contains("graft-sf100-txt"))
    val qs = Bench.parsePriorQueries(f)
    assert(qs.nonEmpty && qs.valuesIterator.forall(_ > 0))
    // every baseline key must be a real SparkEntry query — a typo here
    // would silently never flag
    val known = SparkEntry.queries.keySet
    assert(qs.keySet.subsetOf(known), s"unknown: ${qs.keySet -- known}")
  }
}

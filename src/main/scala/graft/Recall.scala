package graft

import org.apache.spark.sql.SparkSession

/** ANN quality gate: recall@[[queries.VectorQueries.TopK]] of each
  * approximate index (sign-LSH e02, trained IVF e03, sample-trained IVF
  * e07) against the exact brute-force baseline e01, on the same bounded
  * probe set (all four share the probe filter, so the query sets align).
  *
  * Determinism checks (the CORRECTNESS gate) prove the index computes what
  * it says; they cannot see whether the index returns GOOD neighbors — an
  * IVF whose cells degenerated would still hash-match its own oracle. This
  * gate scores neighbor quality: |approx top-k ∩ exact top-k| / |exact
  * top-k|, and fails the run when any index drops below its committed
  * floor.
  *
  * Context for the floor values: the corpus embeddings are ISOTROPIC
  * random vectors (measured: same-label and cross-label cosine
  * distributions identical, top-5 neighbors share labels at chance) — the
  * hardest regime for ANN, where recall is bought only with probe volume.
  * The first run of this gate measured e02 at 0.04 (single AND-band LSH)
  * and IVF at 0.24 (nprobe=2); the fixes it forced were OR-construction
  * with np-adaptive band growth for e02 and, in round 6, the
  * npr = max(12, ceil(1.3·C^0.65)) probe schedule for e03/e07 (a fixed
  * nprobe=8 decayed 0.70 → 0.52 → 0.35 across three decades; the C^0.65
  * schedule holds measured recall ≈ 0.6-0.7 at sf0.1, the 10× AND the
  * 100× scale-ups — see VectorQueries.IvfProbes for the sweep data, and
  * note the 100× gate is what pushed the exponent from the fitted 0.6,
  * which measured 0.543 there, to 0.65). e02 holds
  * flat because its band count grows with np. [[Floors]] sit under the
  * measured range with slack for corpus-shape variance and far above the
  * degenerate regime this gate exists to catch — a collapsed IVF scores
  * ≈ npr/C ≈ 0.1.
  *
  * Usage: runMain graft.Recall [sfDir] [outFile]
  */
object Recall {

  /** Committed per-index recall floors.
    *
    * ANCHOR ENDPOINT RULE (round 14, closes the scale-anchor cadence):
    * the growth schedules are validated by gate-measured anchors at
    * 10⁵..6.4×10⁷ vectors — e02 has EIGHT anchors ending at 64 M
    * (np=21, recall 0.9375, decay flat and recall rising with corpus
    * size), IVF-sampled has post-fifth-decade points at 16 M (0.7813,
    * flat across the decade — see RECALL.json for the full anchor
    * ledger). Anchor cadence ENDS at the committed depth: further
    * decades on one box validate nothing the flat side hasn't already
    * shown (the e01 exact baseline alone exceeds 2 h past 10⁸, np=22's
    * 128 M corpus is pure rig cost, not information, and the round-14
    * 32 M IVF attempt measured the boundary directly: ~45 GB of
    * assignment-sort spill and >2.5 h of saturated 32-thread IVF compute
    * without completing — SCALE.md "the attempt IS the endpoint
    * evidence"). Take a NEW
    * anchor only when (a) the corpus SHAPE changes — non-isotropic /
    * clustered embeddings, a different dimension, a different id scheme —
    * since every committed constant was fitted on isotropic vectors, the
    * hardest regime; or (b) a gate row lands below floor + 0.05 margin
    * (e02 < 0.80, IVF < 0.60), which says the schedule is consuming its
    * slack and the growth constant must be re-fitted (e02's committed
    * step: 1.25 → ~1.30 only if an anchor lands below ~0.84).
    */
  val Floors: Map[String, Double] = Map(
    "e02_lsh_topk" -> 0.75,
    "e03_ivf_topk" -> 0.55,
    "e07_ivf_topk_sampled" -> 0.55)

  /** recall@K per approximate index vs the exact baseline. The baseline is
    * MATERIALIZED to the driver and rebuilt as a local DataFrame (bounded:
    * ~probe-sample × K ≈ 2.5 k (q_id, n_id) pairs at any corpus size — the
    * probe modulus caps the sample) instead of cache()d: a cached e01
    * keeps its whole lineage strongly reachable, which pins the exact
    * scan's shuffle files on disk for the rest of the run — at the 4 M
    * vector corpus those leftovers held ~25 GB while e02's own banded sort
    * legitimately spilled ~22 GB, and the two together hit ENOSPC.
    * Cutting the lineage lets ContextCleaner reap e01's shuffles at the
    * System.gc() below, before any index query runs.
    */
  def measure(spark: SparkSession, sfDir: String,
              only: Set[String] = Set.empty): Map[String, Double] = {
    val src = SparkEntry.queries("e01_cosine_topk")(spark, sfDir)
      .select("q_id", "n_id")
    val exactRows = src.collect()
    val exact = spark.createDataFrame(
      spark.sparkContext.parallelize(exactRows.toIndexedSeq, 1), src.schema)
    val denom = exactRows.length.toDouble
    System.gc() // let ContextCleaner drop the exact run's shuffle files
    Floors.keys.toSeq.sorted
      .filter(q => only.isEmpty || only(q)).map { q =>
        val hits = SparkEntry.queries(q)(spark, sfDir).select("q_id", "n_id")
          .join(exact, Seq("q_id", "n_id"), "left_semi").count()
        System.gc() // same, per index query (Bench.runOne's rationale)
        q -> hits / denom
      }.toMap
  }

  def main(args: Array[String]): Unit = {
    // RECALL.json rows are built with locale-sensitive f"" interpolation;
    // pin the locale so a non-US JVM can't render comma decimals (same fix
    // as Bench — round-14 advice)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outFile = if (args.length > 1) args(1) else "RECALL.json"
    // Dev knob: restrict to a comma-separated index subset (args(2)) so an
    // anchor run can measure one family without paying the others' cold
    // index builds — at 16 M vectors the full-train IVF build alone
    // extrapolates to ~4 h (3 N·C scoring passes, N·C = 6.4e10), while the
    // e02 growth-constant decision that anchor exists for needs only the
    // LSH row. An incomplete row still records which floors it covered.
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).toSet else Set.empty
    // Fail fast on a typo'd subset BEFORE paying the e01 exact-baseline
    // build: a name outside Floors would otherwise be silently filtered
    // out, appending an empty {"recall":{}} row and exiting 0 as if the
    // gate passed with nothing measured.
    val unknown = only -- Floors.keySet
    if (unknown.nonEmpty)
      sys.error(s"unknown index name(s) ${unknown.toSeq.sorted.mkString(", ")}; " +
        s"valid: ${Floors.keySet.toSeq.sorted.mkString(", ")}")
    val spark = GraftSession.get("graft-recall")
    val r = measure(spark, sfDir, only)
    val js = r.toSeq.sorted.map { case (k, v) => f""""$k":$v%.4f""" }.mkString(",")
    val fl = Floors.toSeq.filter(kv => r.contains(kv._1)).sorted
      .map { case (k, v) => f""""$k":$v%.2f""" }.mkString(",")
    val line =
      s"""{"sf":"$sfDir","k":${queries.VectorQueries.TopK},"recall":{$js},"floors":{$fl}}"""
    println(line)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      java.util.Arrays.asList(line), java.nio.charset.StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    catch { case e: Throwable => System.err.println(s"[recall] file dump: $e") }
    val failed = r.filter { case (q, v) => v < Floors(q) }
    spark.stop()
    if (failed.nonEmpty)
      sys.error(s"ANN recall below committed floor: $failed")
  }
}

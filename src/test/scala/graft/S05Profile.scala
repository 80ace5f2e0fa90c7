package graft

import org.apache.spark.sql.functions._

/** Dev-only phase profiler for s05 (stream-stream interval join), the last
  * big warm-suite term carrying an outside-in "streaming machinery"
  * attribution (round-13 verdict task 3). The s01 precedent says probe
  * before trusting: s01's "inherent" 137 s was half serial parquet
  * planning and is now 2.3x cheaper.
  *
  * Decomposition:
  *   - batch floors measured in the SAME session: the double filtered scan
  *     of events.parquet (s05 reads the file once per join side) and the
  *     equivalent BATCH interval join (the pure join compute, no streaming
  *     state) — what a batch engine would pay for the same answer.
  *   - the real s05 (x2, warm second), with a StreamingQueryListener
  *     capturing every micro-batch's durationMs map (addBatch = plan
  *     execution; walCommit/latestOffset/getBatch/queryPlanning/
  *     commitOffsets = machinery) and per-operator state-store metrics
  *     (update/removal/commit times, rows buffered) — so "machinery" is a
  *     per-term number, not an envelope.
  */
object S05Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("s05-profile")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s05prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    spark.range(1000).count() // session warm-up

    // every micro-batch's progress for s05-named queries
    val progress =
      new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.streaming.StreamingQueryProgress]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          if (e.progress.name != null && e.progress.name.startsWith("s05"))
            progress.add(e.progress)
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      })

    // ---- batch floors ----
    val ev = graft.Tables.fixEventTs(spark.read.parquet(s"$d/events.parquet"))
    phase("floor/a events double scan") {
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts")).count()
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts")).count()
      println(s"[s05prof] clicks = $clicks, views = $views")
    }
    phase("floor/b batch interval join") {
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
          col("ts").as("view_ts"))
      val n = clicks.join(views,
        col("user_id") === col("view_user") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 6 HOURS") &&
          col("view_ts") <= col("click_ts")).count()
      println(s"[s05prof] batch join rows = $n")
    }

    // ---- the real s05: cold + warm per state-store provider ----
    // Round-15 probe (round-14 verdict task 2): the residual s05 cost is
    // summed per-row state-store update time on the on-heap
    // HDFSBackedStateStoreProvider; RocksDBStateStoreProvider is the
    // cluster-scale answer for corpus-sized state. Sweep both providers in
    // ONE session (sys-prop knob) so the comparison shares JIT warmth,
    // device state, and the drain harness. args(1) optionally restricts
    // (e.g. "rocksdb" or "hdfs").
    val providers = args.lift(1).map(Seq(_)).getOrElse(Seq("hdfs", "rocksdb"))
    providers.foreach { prov =>
      sys.props("graft.stream.provider") = prov
      try {
        phase(s"real s05[$prov] run1")(
          queries.StreamingQueries.queries("s05_stream_stream_join")(spark, d).count())
        // listener bus delivery is async: let run1's tail progress events
        // drain BEFORE the clear, or they land afterwards and inflate the
        // warm-run machinery/state totals (round-14 advice)
        Thread.sleep(300)
        progress.clear()
        phase(s"real s05[$prov] run2 (warm)")(
          queries.StreamingQueries.queries("s05_stream_stream_join")(spark, d).count())
        Thread.sleep(300)

        // per-batch machinery breakdown from the warm run
        val keys = Seq("addBatch", "getBatch", "latestOffset", "queryPlanning",
          "walCommit", "commitOffsets", "triggerExecution")
        val totals = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
        var batches = 0
        progress.forEach { p =>
          batches += 1
          keys.foreach { k =>
            totals(k) += Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
          }
          val so = p.stateOperators.map { s =>
            f"rows=${s.numRowsTotal} updated=${s.numRowsUpdated} " +
              f"updMs=${s.allUpdatesTimeMs} rmMs=${s.allRemovalsTimeMs} " +
              f"commitMs=${s.commitTimeMs} memMB=${s.memoryUsedBytes / 1e6}%.1f"
          }.mkString(" | ")
          println(f"[s05prof]   batch=${p.batchId}%3d in=${p.numInputRows}%9d " +
            f"trigger=${Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)}%6d ms " +
            f"addBatch=${Option(p.durationMs.get("addBatch")).map(_.longValue).getOrElse(0L)}%6d ms  $so")
        }
        println(s"[s05prof] [$prov] warm micro-batches = $batches")
        keys.foreach(k => println(f"[s05prof]   [$prov] total ${k}%-16s ${totals(k) / 1e3}%7.2f s"))
        val machinery = totals("triggerExecution") - totals("addBatch")
        println(f"[s05prof]   [$prov] trigger minus addBatch (pure machinery) ${machinery / 1e3}%7.2f s")
        progress.clear()
      } finally sys.props.remove("graft.stream.provider")
    }
    spark.stop()
  }
}

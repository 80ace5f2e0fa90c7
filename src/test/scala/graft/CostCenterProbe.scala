package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.cawd.{CawdEngine, CawdExport, OrcChunker}

/** Dev-only: decompose the round-11 top cost centers (c01 cold chunk scan,
  * c06 byte-identity reconstruction, q04 big join) into their physical
  * terms, so "scan/IO-inherent" is a measurement, not a belief (round-11
  * verdict task 6). s01 already has [[S01Profile]].
  *
  * Terms per query:
  *   - c01: raw byte I/O floor (stream every corpus parquet byte, no
  *     parse), DSv2 chunk scan (parse + SHA-1, no write), full query
  *     (adds export write + rollup).
  *   - c06: chunk+hash+carry pass (no write), export write, digest from
  *     export (shuffle-sort + recon SHA-1 + source re-read SHA-1), source
  *     re-read floor alone.
  *   - q04: lineitem column-scan floor, orders scan floor, l⋈o join only,
  *     full query.
  */
object CostCenterProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args.drop(1).toSet else Set("c01", "c06", "q04")
    val spark = GraftSession.get("cost-probe")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cost] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000).count() // session warm-up

    val files = CawdEngine.listFiles(d, ".parquet")

    if (which("c01")) {
      // (a) pure I/O floor: every byte of every corpus parquet file through
      // the same Hadoop FS API the chunkers use, 1 MB buffers, no parse
      time("c01/a raw byte stream (all files)") {
        val bytes = spark.createDataset(files)
          .repartition(files.size)
          .map { case (p, _) =>
            val path = new Path(p)
            val fs = path.getFileSystem(new Configuration())
            val in = fs.open(path)
            val buf = new Array[Byte](1 << 20)
            var total = 0L
            try {
              var n = in.read(buf)
              while (n > 0) { total += n; n = in.read(buf) }
            } finally in.close()
            total
          }.reduce(_ + _)
        println(s"[cost] c01 corpus bytes = $bytes")
      }
      // (a2) plan-only pass, driver-serial exactly like ChunkScan below the
      // distributed-plan cutoff: footer + page-header walk, no hashing —
      // isolates the metadata term from the SHA-1/stream term
      time("c01/a2 plan-only (driver-serial)") {
        val nChunks = files.zipWithIndex.map { case ((f, _), r) =>
          CawdEngine.planFile(f, r, CawdEngine.Parquet, OrcChunker.StripeColumn).size
        }.sum
        println(s"[cost] c01 planned metas = $nChunks")
      }
      // (b) DSv2 chunk scan: footer/page parse + per-chunk SHA-1, no write
      time("c01/b DSv2 chunk scan (no write)")(
        println(s"[cost] c01 chunks = ${spark.read.format("graft-chunks").load(d).count()}"))
      // (c) the full query (adds the export write + the small rollup)
      time("c01/c full query")(
        SparkEntry.queries("c01_parquet_chunk_table")(spark, d)
          .write.format("noop").mode("overwrite").save())
    }

    if (which("c06")) {
      val orcDir = queries.CawdQueries.ensureOrcFixtures(spark, d)
      def cover = {
        val orc = CawdEngine.chunkFiles(spark,
          CawdEngine.listFiles(orcDir, ".orc"),
          CawdEngine.Orc, OrcChunker.StripeColumn, withContent = true)
        val pq = CawdEngine.chunkFiles(spark, files, CawdEngine.Parquet,
          withContent = true)
        orc.unionByName(pq)
          .filter(c => c.parentSeq != -2 &&
            !(c.chunkType == graft.cawd.ChunkType.Column && c.parentSeq != -1))
          .select(col("file"), col("seq"), col("size"), col("content"))
      }
      // (a) chunk + hash + content carry, no write (sum sizes forces content)
      time("c06/a chunk+hash+carry (no write)")(
        println(s"[cost] c06 cover bytes = ${cover.agg(sum("size")).head().getLong(0)}"))
      // (b) the export write (the ~corpus-sized parquet round-trip)
      time("c06/b export write")(CawdExport.materializeDf(spark, d, "c06", cover))
      // (c) digest from the export: child-session read + repartition(file)
      // sort + streaming recon SHA-1 + source re-read SHA-1
      val c = GraftSession.child(spark, "c06-reassembly", shufflePartitions = Some(8))
      c.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16")
      time("c06/c digest from export")(
        CawdEngine.reconstructionCheckRows(
          c.read.parquet(CawdExport.dir(d, "c06")))
          .write.format("noop").mode("overwrite").save())
      // (d) the source re-read SHA-1 floor alone (same files, one pass)
      time("c06/d source re-read SHA-1 floor") {
        val allFiles = files ++ CawdEngine.listFiles(orcDir, ".orc")
        spark.createDataset(allFiles).repartition(allFiles.size)
          .map { case (p, _) =>
            val path = new Path(p)
            val fs = path.getFileSystem(new Configuration())
            val md = java.security.MessageDigest.getInstance("SHA-1")
            val in = fs.open(path)
            val buf = new Array[Byte](1 << 20)
            try {
              var n = in.read(buf)
              while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
            } finally in.close()
            md.digest().length.toLong
          }.reduce(_ + _)
      }
    }

    if (which("q04")) {
      // (a) lineitem scan floor over exactly q04's columns
      // keys sum as double: at the 1000x corpus the rep-offset BIGINT keys
      // overflow a long sum (600 M rows x ~5e11 each) under ANSI mode
      time("q04/a lineitem column scan") {
        spark.read.parquet(s"$d/lineitem.parquet")
          .agg(sum(col("l_orderkey").cast("double")),
            sum(col("l_extendedprice")), sum(col("l_discount")))
          .collect()
      }
      // (b) orders scan floor
      time("q04/b orders column scan") {
        spark.read.parquet(s"$d/orders.parquet")
          .agg(sum(col("o_orderkey").cast("double")),
            sum(col("o_custkey").cast("double"))).collect()
      }
      // (c) the l⋈o join alone (the shuffle that carries every lineitem row)
      time("q04/c lineitem-orders join only") {
        val l = spark.read.parquet(s"$d/lineitem.parquet")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val o = spark.read.parquet(s"$d/orders.parquet")
          .select("o_orderkey", "o_custkey")
        println("[cost] q04 l⋈o rows = " +
          l.join(o, col("l_orderkey") === col("o_orderkey")).count())
      }
      // (d) the full query
      time("q04/d full query")(
        SparkEntry.queries("q04_revenue_by_nation")(spark, d)
          .write.format("noop").mode("overwrite").save())
    }

    if (which("q04pre")) {
      // Round-14 candidate: partial aggregate by l_orderkey BEFORE the l⋈o
      // join. Lineitem is clustered by orderkey (~4 rows/order arrive
      // consecutively), so a partial HashAggregate compresses the orderkey
      // exchange ~4x ON THE MAP SIDE and the join reuses the same hash
      // partitioning — the round-12 custkey trick applied one join earlier.
      // Same child-session sizing HELPER as the shipped q04 so the
      // comparison is plan-vs-plan, not conf-vs-conf — the probe must not
      // silently diverge if lineitem ever becomes a parquet directory
      // (java.io.File.length on a dir reads the inode; round-14 advice)
      val c = queries.RelationalQueries.sizedForInput(spark, "q04pre", d, "lineitem")
      def dec(col0: org.apache.spark.sql.Column, t: String = "decimal(12,2)") =
        col0.cast(t)
      val l = c.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val o = c.read.parquet(s"$d/orders.parquet").select("o_orderkey", "o_custkey")
      // (a) the bare per-order aggregate: how many rows survive to the
      // exchange, and what the extra aggregation pass costs by itself
      time("q04pre/a per-order partial agg only") {
        println("[cost] q04pre per-order rows = " + l.groupBy("l_orderkey")
          .agg(sum(dec(col("l_extendedprice"))).as("x")).count())
      }
      // (b) pre-aggregated l⋈o join alone (vs q04/c's raw-row join)
      time("q04pre/b perOrder-orders join only") {
        val perOrder = l.groupBy(col("l_orderkey"))
          .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(4,2)") - dec(col("l_discount"), "decimal(4,2)")))
            .as("rev_part"), count(lit(1)).as("n_part"))
        println("[cost] q04pre l⋈o rows = " +
          perOrder.join(o, col("l_orderkey") === col("o_orderkey")).count())
      }
      // (c) the full alternate query, byte-for-byte q04 semantics
      time("q04pre/c full alternate query") {
        val cust = c.read.parquet(s"$d/customer.parquet")
          .select("c_custkey", "c_nationkey")
        val nat = c.read.parquet(s"$d/nation.parquet")
          .select("n_nationkey", "n_name")
        val perOrder = l.groupBy(col("l_orderkey"))
          .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(4,2)") - dec(col("l_discount"), "decimal(4,2)")))
            .as("rev_part"), count(lit(1)).as("n_part"))
        val perCust = perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("rev_part")).as("rev_part"), sum(col("n_part")).as("n_part"))
        perCust
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("rev_part")).cast("double").as("revenue"),
            sum(col("n_part")).as("n_rows"))
          .write.format("noop").mode("overwrite").save()
      }
    }

    if (which("s03pre")) {
      // Round-15 candidate (round-14 verdict task 3): partition-local
      // pre-fold before s03's 5-key stateful exchange. Both shapes run
      // through the IDENTICAL drain harness via the sys-prop knob; warm
      // second runs are the comparable pair (first run pays source-listing
      // and codegen). Also decomposed: the bare source-scan floor, to tell
      // whether the exchange is material at all.
      time("s03pre/floor events scan+project") {
        val n = graft.Tables.fixEventTs(spark.read.parquet(s"$d/events.parquet"))
          .select(col("event_type"),
            round(col("value") * 1e6, 0).cast("long").as("micros"))
          .count()
        println(s"[cost] s03pre event rows = $n")
      }
      def runS03(tag: String, prefold: String): Unit = {
        sys.props("graft.s03.prefold") = prefold
        try {
          time(s"s03pre/$tag run1")(
            queries.StreamingQueries.queries("s03_stateful_running_totals")(spark, d)
              .write.format("noop").mode("overwrite").save())
          time(s"s03pre/$tag run2 (warm)")(
            queries.StreamingQueries.queries("s03_stateful_running_totals")(spark, d)
              .write.format("noop").mode("overwrite").save())
        } finally sys.props.remove("graft.s03.prefold")
      }
      runS03("per-row (shipped r14)", "0")
      runS03("pre-fold", "1")
    }

    if (which("c06fuse")) {
      // Round-16 candidate (round-15 verdict task 1): digest the cover
      // content AS the export is written (per-run partial digests to a
      // sidecar, ranges verified against the originals) instead of the old
      // shape's export read-back + repartition(file) content exchange +
      // digest sort. Both shapes run the FULL shipped query through the
      // identical harness via the sys-prop knob, with Bench's exact
      // measurement protocol (resetMemo before each timed run so the
      // export write is re-paid, clearCache + GC between runs); warm
      // second runs are the comparable pair. Old runs once more at the end
      // as an order-effect control.
      def runC06(tag: String, fused: String): Unit = {
        sys.props("graft.c06.fused") = fused
        try Seq("run1", "run2 (warm)").foreach { leg =>
          CawdExport.resetMemo()
          time(s"c06fuse/$tag $leg")(
            SparkEntry.queries("c06_reconstruction")(spark, d)
              .write.format("noop").mode("overwrite").save())
          spark.catalog.clearCache()
          System.gc()
        } finally sys.props.remove("graft.c06.fused")
      }
      runC06("old four-pass", "0")
      runC06("fused", "1")
      sys.props("graft.c06.fused") = "0"
      try {
        CawdExport.resetMemo()
        time("c06fuse/old control (order check)")(
          SparkEntry.queries("c06_reconstruction")(spark, d)
            .write.format("noop").mode("overwrite").save())
      } finally sys.props.remove("graft.c06.fused")
    }
    spark.stop()
  }
}

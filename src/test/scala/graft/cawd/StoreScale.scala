package graft.cawd

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Dev-only at-scale validation of the streaming chunk store (VERDICT r7
  * task 6): the design claims co-partitioned, partition-pruned probes
  * against a store of 10⁹ signatures, but the store had only ever held
  * toy-scale state. This main builds stores of 10⁶..10⁸ DISTINCT
  * signatures in the real layout (batch=N/sbucket=K via
  * [[StreamingEngine.writeStorePartition]]), then measures:
  *
  *   - probe latency of a micro-batch-sized probe set
  *     ([[Dedup.markFirstOccurrence]] — the exact per-batch plan), for a
  *     WIDE probe (4096 sigs — touches every bucket, so the cost is the
  *     narrow signature-column scan of the whole store) and a NARROW probe
  *     (32 sigs — bucket pruning reads ≤ 32/256 of the store);
  *   - compaction wall time and the distinct-signature invariant at the
  *     largest size;
  *   - retention delete behavior at the largest size.
  *
  * Usage: runMain graft.cawd.StoreScale [maxExp=8] [baseDir=/tmp/graft-store-scale]
  * Results land in SCALE.md (hand-copied; this is a measurement tool, not
  * a gate — the semantics gates live in StreamingSpec).
  */
object StoreScale {

  def main(args: Array[String]): Unit = {
    val maxExp = args.headOption.map(_.toInt).getOrElse(8)
    val base = if (args.length > 1) args(1) else "/tmp/graft-store-scale"
    val spark = GraftSession.get("store-scale")
    import spark.implicits._

    def sigs(from: Long, n: Long) =
      spark.range(from, from + n)
        .select(expr("unhex(md5(CAST(id AS STRING)))").as("signature"),
          lit("chunk").as("chunkType"), lit(4096L).as("size"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    (6 to maxExp).foreach { exp =>
      val n = math.pow(10, exp).toLong
      val dir = s"$base/n1e$exp"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/batch=0"))) {
        val (_, tw) = time {
          StreamingEngine.writeStorePartition(sigs(0, n), s"$dir/batch=0",
            clusterBuckets = true)
        }
        println(f"[store-scale] n=1e$exp build $tw%.1f s")
      }
      val store = StreamingEngine.readStore(spark, dir).get

      // probe: half hits (ids inside the store range), half misses
      def probe(nProbe: Int, label: String): Unit = {
        val probeChunks = sigs(n - nProbe / 2, nProbe)
          .withColumn("fileRank", (monotonically_increasing_id() % 8).cast("int"))
          .withColumn("seq", monotonically_increasing_id())
        // 3 reps; report best (steady state) and first (cold listing/JIT)
        val times = (1 to 3).map { _ =>
          val (hits, t) = time {
            Dedup.markFirstOccurrence(probeChunks, "seq", Some(store))
              .filter(col(Dedup.InStoreCol)).count()
          }
          require(hits == nProbe / 2, s"expected ${nProbe / 2} hits, got $hits")
          t
        }
        println(f"[store-scale] n=1e$exp probe=$label cold=${times.head}%.2f s " +
          f"best=${times.min}%.2f s")
      }
      probe(4096, "wide4096")
      probe(32, "narrow32")
    }

    // compaction + retention at the largest size: 4 batch partitions with
    // 25% cross-batch overlap, compact, assert the distinct invariant
    val n = math.pow(10, maxExp).toLong
    val cdir = s"$base/compact1e$maxExp"
    val per = n / 4
    (0 until 4).foreach { b =>
      // overlap: each batch re-writes the last quarter of the previous one
      StreamingEngine.writeStorePartition(
        sigs(b * (per - per / 4), per), s"$cdir/batch=$b",
        clusterBuckets = true)
    }
    val (_, tc) = time { StreamingEngine.compactStore(spark, cdir) }
    val after = StreamingEngine.readStore(spark, cdir).get
    val (rows, tcount) = time { after.count() }
    val (distinct, _) = time { after.select("signature").distinct().count() }
    println(f"[store-scale] compact n=4x${per} merged in $tc%.1f s -> " +
      f"$rows rows ($distinct distinct, counted in $tcount%.1f s)")
    require(distinct == 3 * (per - per / 4) + per,
      s"distinct after compact: $distinct")
    val (_, tr) = time { StreamingEngine.retainStore(cdir, keepBatches = 1) }
    println(f"[store-scale] retention keep=1 in $tr%.1f s, " +
      s"batches left=${new java.io.File(cdir).list().count(_.startsWith("batch="))}")
    spark.stop()
  }
}

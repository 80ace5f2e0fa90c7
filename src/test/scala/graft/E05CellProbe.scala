package graft

import org.apache.spark.sql.functions._

/** Dev-only: measure e05's cell-count tradeoff (r9 task 6 / r10 task 5).
  * With C = ceil(sqrt(N)) both the cell count AND the mean cell population
  * grow as √N, so the within-cell verify is Θ(N^1.5) — at 2 M vectors e05
  * is verify-bound (334 s, BENCH_sf100_full). Raising the exponent shrinks
  * cells (verify ~N²/C falls) but inflates k-medians training (~N·C·d per
  * round) — the sweep measures where the crossover sits and what the drop
  * set loses (SemDeDup only compares within a cell, so smaller cells find
  * fewer duplicates).
  *
  * For each exponent: run the FULL e05 with cellExpr = ceil(power(N, exp)),
  * time it, write the dropped set to /tmp, and report n_dropped plus
  * drop-set recall vs the √N baseline (|drops∩base| / |base|).
  *
  * Usage: Test/runMain graft.E05CellProbe [corpusDir] [exp1,exp2,...]
  *   (0.5 is rewritten to the production DefaultCellExpr so the baseline
  *   is the exact shipped query)
  */
object E05CellProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf100-txt")
    val exps = args.lift(1).getOrElse("0.5,0.6").split(",").map(_.trim.toDouble)
    val spark = GraftSession.get("e05-cell-probe")
    val ds = GraftSession.child(spark, queries.VectorQueries.DenseTag, aqe = false)
    Tables.embeddingsDense(ds, d).createOrReplaceTempView("embeddings")
    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[e05cell] $label%-32s $sec%9.2f s")
      (r, sec)
    }
    // reuse a prior invocation's √N baseline drop set if present, so
    // follow-up single-exponent runs don't re-pay the baseline
    var baseDrops: Option[org.apache.spark.sql.DataFrame] =
      if (new java.io.File("/tmp/e05cell_50/_SUCCESS").exists())
        Some(ds.read.parquet("/tmp/e05cell_50"))
      else None
    exps.foreach { e =>
      val cellExpr =
        if (e == 0.5) queries.VectorQueries.DefaultCellExpr
        else s"ceil(power(count(*), $e))"
      val sql = queries.VectorQueries.semanticDedupSql(spark = true,
        cellExpr = cellExpr)
      val out = s"/tmp/e05cell_${(e * 100).toInt}"
      val (_, sec) = time(s"e05 full exp=$e") {
        ds.sql(sql).filter(col("keep") === false)
          .select("vec_id", "dup_of")
          .write.mode("overwrite").parquet(out)
      }
      val drops = ds.read.parquet(out)
      val n = drops.count()
      val cells = ds.sql(
        s"SELECT CAST($cellExpr AS INT) AS c FROM embeddings").head().getInt(0)
      val recall = baseDrops match {
        case None => baseDrops = Some(drops); 1.0
        case Some(b) =>
          val inter = drops.select("vec_id").join(b.select("vec_id"), "vec_id").count()
          inter.toDouble / math.max(b.count(), 1L)
      }
      println(f"[e05cell] RESULT exp=$e%.2f cells=$cells n_dropped=$n " +
        f"drop_recall_vs_base=$recall%.4f time=$sec%.1f s")
    }
    spark.stop()
  }
}

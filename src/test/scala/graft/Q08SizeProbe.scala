package graft

import org.apache.spark.sql.functions._
import graft.Tables._

/** Dev-only A/B: q08's distinct-pair aggregate at the session-wide
  * cores-sized shuffle vs the input-sized child (sizedForInput seam).
  */
object Q08SizeProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/graft-sf100-txt")
    val spark = GraftSession.get("q08-size-probe")
    def run(parts: Int, label: String): Unit = {
      val s = GraftSession.child(spark, s"q08-probe-$label", aqe = true,
        shufflePartitions = Some(parts))
      val t0 = System.nanoTime()
      val n = lineitem(s, sf)
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(count(lit(1)).as("__pair_n"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_parts"), sum(col("__pair_n")).as("n_items"))
        .count()
      println(f"[q08-ab] parts=$parts%4d rows=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val cores = spark.sparkContext.defaultParallelism
    run(cores, "cores")
    val p = new org.apache.hadoop.fs.Path(s"$sf/lineitem.parquet")
    val bytes = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
    run(math.max(cores.toLong, bytes / (32L * 1024 * 1024)).toInt, "sized")
    spark.stop()
  }
}

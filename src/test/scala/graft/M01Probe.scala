package graft

import org.apache.spark.sql.functions._

/** Dev-only: decompose m01's COLD cost at a given corpus — the D22Probe
  * pattern. The cold m01 term is the `media_features` persisted build,
  * which above the blob-persist cap streams the encode fused with the
  * decode: stage (1) isolates the blob ENCODE (mediaTable — synthesizing
  * PNG/WAV/MP4 containers from the documents corpus), stage (2) adds the
  * DECODE (extractFeatures: javax.imageio + WAV/BMFF parsers) with no
  * write, stage (3) is the full persisted build the query pays cold, and
  * stage (4) the warm read. decode floor ≈ (2)−(1); export write ≈
  * (3)−(2); anything left in (3) beyond those is pipeline overhead.
  */
object M01Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf100-txt")
    val spark = GraftSession.get("m01-probe")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[m01] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = Tables.documentsDense(spark, d)
    // (1) encode only: force every blob's bytes (sum of lengths cannot be
    // answered without materializing content through the codec kernels)
    time("encode only (mediaTable bytes)") {
      val n = multimodal.Media.mediaTable(spark, docs)
        .map(r => r.content.length.toLong).toDF("n")
        .agg(sum("n")).head.getLong(0)
      println(s"[m01] blob_bytes = $n")
    }
    // (2) encode + decode, compute-only (no export write)
    time("encode+decode (no write)") {
      multimodal.Media.extractFeatures(
        multimodal.Media.mediaTable(spark, docs))
        .toDF().agg(sum("n_bytes")).head
    }
    // (3) the query's own cold path: persisted media_features build
    time("m01 full (persisted path, 1st)")(
      println(s"[m01] n_rows = ${SparkEntry.queries("m01_media_features")(spark, d).count()}"))
    // (4) warm: pure export read
    time("m01 full (persisted path, 2nd)")(
      SparkEntry.queries("m01_media_features")(spark, d).count())
    spark.stop()
  }
}

package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftSession, SparkEntry}

/** Above the blob-export row cap the media pack runs FUSED (encode feeding
  * decode, no blob table on disk). The cap must change COST only: every
  * media query's rows are pinned identical across the two branches.
  */
class FusedMediaSpec extends AnyFunSuite {

  private val Corpus = "/root/testdata/sf0.001"
  private val MediaQs = Seq("m01_media_features", "m02_media_resize",
    "m03_modality_rollup", "m04_frame_sample", "m05_modality_balance")

  test("fused (over-cap) media pipeline returns byte-identical rows to the " +
    "persisted-blob path for every media query") {
    val spark = GraftSession.get("fused-media-spec")
    try {
      MediaQs.foreach { q =>
        spark.conf.unset("spark.graft.media.maxExportRows")
        val persisted = SparkEntry.queries(q)(spark, Corpus)
          .collect().map(_.toString).sorted
        // cap 0 docs → every corpus takes the fused branch
        spark.conf.set("spark.graft.media.maxExportRows", "0")
        val fused = SparkEntry.queries(q)(spark, Corpus)
          .collect().map(_.toString).sorted
        assert(fused.nonEmpty, s"$q returned no rows")
        assert(fused.sameElements(persisted),
          s"$q differs between fused and persisted paths")
      }
    } finally {
      spark.conf.unset("spark.graft.media.maxExportRows")
      spark.stop()
    }
  }
}

package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftSession, SparkEntry, Tables}

/** Round-11 persisted trained-IVF index: the split into a centroid build
  * (training rounds without the final scoring pass) plus an assign build
  * (that final pass against the parquet-round-tripped centroids) must be
  * VALUE-IDENTICAL to inline training — same trained cells, same probes,
  * same rerank rows, same dedup drops. The DuckDB oracle already proves
  * this at sf0.01; this spec proves it against the engine's OWN inline
  * derivation, so a persistence bug (stale content key, lossy round-trip,
  * wrong-round centroids, full/sampled table mixup) fails fast in
  * `sbt test` without the oracle.
  */
class IvfPersistSpec extends AnyFunSuite {

  private val d = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("e03/e07/e05 persisted-index results equal inline training") {
    val spark = GraftSession.get("ivf-persist-spec")
    // the inline derivations need the same dense-session embeddings view
    // the query entries register; same child session, same corpus
    val ds = GraftSession.child(spark, VectorQueries.DenseTag, aqe = false)
    Tables.embeddingsDense(ds, d).createOrReplaceTempView("embeddings")
    val inline = Seq(
      "e03_ivf_topk" -> VectorQueries.ivfSql(spark = true),
      "e07_ivf_topk_sampled" ->
        VectorQueries.ivfSql(spark = true, trainSample = true),
      "e05_semantic_dedup" -> VectorQueries.semanticDedupSql(spark = true))
    inline.foreach { case (q, sql) =>
      val persisted = rows(SparkEntry.queries(q)(spark, d))
      val direct = rows(ds.sql(sql))
      assert(persisted.nonEmpty, s"$q returned no rows")
      assert(persisted == direct, s"$q persisted-index result != inline training")
    }
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.multimodal.Media

/** Multimodal pipeline pack: opaque-binary media columns + partition-batched
  * (stub) decode + feature/resize/rollup stages. The decode values are
  * md5-derived ([[Media.FakeCodec]]) so DuckDB can verify the whole
  * pipeline value-by-value even though the "codec" is a stand-in.
  */
object MediaQueries {

  private def features(s: SparkSession, d: String): DataFrame =
    Media.extractFeatures(Media.mediaTable(s, documents(s, d))).toDF()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary ingest + per-partition decode; 8-dim feature flattened for
    // stable cross-engine comparison.
    "m01_media_features" -> ((s, d) => {
      val f = features(s, d)
      val featCols = (0 until 8).map(i =>
        element_at(col("feature"), i + 1).as(s"f$i"))
      f.select(Seq(col("media_id"), col("modality"), col("n_bytes"),
        col("width"), col("height"), col("n_frames")) ++ featCols: _*)
    }),

    // Deterministic resize kernel stand-in (floor semantics, see Media.resize).
    "m02_media_resize" -> ((s, d) =>
      Media.resize(
        Media.extractFeatures(Media.mediaTable(s, documents(s, d))), 128)),

    // Frame sampling: every 2nd frame of each video → an image-like
    // training row (timestamp, perceptual-hash stand-in, keyframe flag).
    "m04_frame_sample" -> ((s, d) =>
      Media.sampleFrames(Media.mediaTable(s, documents(s, d)), stride = 2).toDF()),

    // Modality rebalancing: deterministically down-sample every modality
    // to the size of the SMALLEST one (the stratified-balance step a
    // multimodal training mix ends with). Selection is by md5 order, so
    // the "random" sample is reproducible in both engines. The per-modality
    // row_number is exact-K selection for verifiability; at corpus scale
    // the same contract is served shuffle-free by hash-THRESHOLD sampling
    // (keep rows with h below the target quantile), trading exact K for a
    // binomial-tight approximation.
    "m05_modality_balance" -> ((s, d) => {
      Media.mediaTable(s, documents(s, d)).toDF()
        .withColumn("h", md5(col("content")))
        .createOrReplaceTempView("media")
      s.sql(
        """WITH ranked AS (
          |  SELECT media_id, modality, h,
          |    row_number() OVER (PARTITION BY modality ORDER BY h, media_id) AS samp_rank
          |  FROM media)
          |SELECT media_id, modality, samp_rank FROM ranked
          |WHERE samp_rank <=
          |  (SELECT min(n) FROM (SELECT count(*) AS n FROM media GROUP BY modality) t)""".stripMargin)
    }),

    // Downstream rollup: modality-level corpus statistics.
    "m03_modality_rollup" -> ((s, d) => {
      features(s, d).groupBy(col("modality")).agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 6).as("avg_width"),
        round(avg(col("height")), 6).as("avg_height"),
        sum(col("n_frames")).as("total_frames"))
    })
  )

  /** DuckDB mirror of [[Media.FakeCodec]] — md5-nibble arithmetic. */
  private val FeatureCte = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1)"
    val feats = (0 until 8).map(i => s"${nib(8 + i)} / 15.0 AS f$i").mkString(", ")
    s"""feat AS (
       |  SELECT doc_id AS media_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       |    octet_length(encode(text)) AS n_bytes,
       |    16 * (1 + ${nib(0)}) AS width,
       |    16 * (1 + ${nib(1)}) AS height,
       |    CASE CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
       |      WHEN 'video' THEN 1 + ${nib(2)} WHEN 'image' THEN 1 ELSE 0 END AS n_frames,
       |    $feats
       |  FROM (SELECT doc_id, text, md5(text) AS h FROM documents) t)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "m01_media_features" ->
      s"""WITH $FeatureCte
         |SELECT media_id, modality, n_bytes, width, height, n_frames,
         |       ${(0 until 8).map(i => s"f$i").mkString(", ")}
         |FROM feat""".stripMargin,

    "m02_media_resize" ->
      s"""WITH $FeatureCte
         |SELECT media_id, modality,
         |  CAST(floor(width * least(1.0, 128.0 / greatest(width, height))) AS INT) AS width,
         |  CAST(floor(height * least(1.0, 128.0 / greatest(width, height))) AS INT) AS height
         |FROM feat""".stripMargin,

    "m03_modality_rollup" ->
      s"""WITH $FeatureCte
         |SELECT modality, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
         |  round(avg(width), 6) AS avg_width, round(avg(height), 6) AS avg_height,
         |  CAST(sum(n_frames) AS BIGINT) AS total_frames
         |FROM feat GROUP BY modality""".stripMargin,

    "m05_modality_balance" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    md5(text) AS h
        |  FROM documents),
        |ranked AS (
        |  SELECT media_id, modality, h,
        |    row_number() OVER (PARTITION BY modality ORDER BY h, media_id) AS samp_rank
        |  FROM media)
        |SELECT media_id, modality, samp_rank FROM ranked
        |WHERE samp_rank <=
        |  (SELECT min(n) FROM (SELECT count(*) AS n FROM media GROUP BY modality) t)""".stripMargin,

    "m04_frame_sample" ->
      """WITH vids AS (
        |  SELECT doc_id AS media_id, md5(text) AS h,
        |    1 + (strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2),
        |frames AS (
        |  SELECT media_id, CAST(i AS INT) AS frame_idx,
        |    CAST((i - 1) * 40 AS INT) AS ts_ms,
        |    md5(h || ':' || CAST(i AS VARCHAR)) AS fh
        |  FROM vids, UNNEST(range(1, n_frames + 1, 2)) AS t(i))
        |SELECT media_id, frame_idx, ts_ms, substr(fh, 1, 16) AS phash,
        |  (strpos('0123456789abcdef', substr(fh, 17, 1)) - 1) < 4 AS is_keyframe
        |FROM frames""".stripMargin
  )
}

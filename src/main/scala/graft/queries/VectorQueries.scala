package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Similarity-search pack over the `embeddings` table (`Array[Float]` dim
  * 64): brute-force cosine top-k as the exactness baseline, plus two
  * scale paths — deterministic sign-LSH bucketing and an IVF-style
  * centroid-pruned search.
  *
  * Verifiability: similarity is computed in double precision and ROUNDED to
  * 6 decimals before ranking, with vec_id tie-breaks, so Spark and DuckDB
  * rank identically despite sub-1e-12 float-fold differences. LSH
  * hyperplanes are md5-derived (w(p, d) = md5-nibble − 7.5), so both
  * engines build byte-identical buckets — the sketch is value-verified.
  *
  * Scale design (100 TB / billions of vectors):
  *   - brute force is the small-scale correctness baseline (quadratic);
  *   - sign-LSH: one narrow projection per vector → bucket id; candidate
  *     pairs form per-bucket (shuffle on bucket key, never all-pairs);
  *   - IVF: assign each vector to its nearest centroid once, queries probe
  *     only `nprobe` nearest cells — the Spark plan is a join on cell id,
  *     i.e. partition pruning for vectors.
  */
object VectorQueries {

  val TopK = 5
  val LshPlanes = 6        // 64 buckets
  val IvfCentroids = 8     // fixed: the vectors with vec_id < 8
  val IvfProbes = 2
  val NdBands = 8          // e04 OR-construction: 8 bands ...
  val NdPlanesPerBand = 4  // ... of 4 hyperplanes each (16 buckets/band)
  val NdThreshold = 0.4

  /** Query subset: every 10th vector probes the index. */
  private val QueryFilter = "vec_id % 10 = 0"

  /** cos(a, b): the native fused-loop Catalyst expression
    * ([[graft.functions.CosineSimilarity]]) — allocation-free single pass
    * inside whole-stage codegen; arithmetic identical to
    * `dot / (sqrt(na) * sqrt(nb))` composed from HOFs.
    */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  private def topkOf(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }

  /** Deterministic hyperplane weights / bucket assignment, common SQL core.
    * Emits per-vector (vec_id, bucket) with bucket = Σ_p (sign_p << p).
    */
  private def lshBucketSql(spark: Boolean): String = {
    val explode = if (spark) "explode" else "unnest"
    val strposFn = if (spark) "instr" else "strpos"
    val shl = if (spark) "shiftleft(b, CAST(p AS INT))" else "(b << p)"
    s"""flat AS (
       |  SELECT vec_id, i, CAST(${if (spark) "element_at(embedding, CAST(i AS INT))"
                                   else "embedding[i]"} AS DOUBLE) AS x
       |  FROM embeddings ${if (spark) "LATERAL VIEW explode(sequence(1, size(embedding))) t AS i"
                            else ", UNNEST(range(1, len(embedding)+1)) AS t(i)"}),
       |planes AS (
       |  SELECT CAST(floor(k / 64.0) AS INT) AS p, (k % 64) + 1 AS i,
       |    ($strposFn('0123456789abcdef',
       |       substr(md5(CAST(CAST(floor(k / 64.0) AS INT) AS STRING) || ':' ||
       |                  CAST((k % 64) + 1 AS STRING)), 1, 1)) - 1) - 7.5 AS w
       |  FROM (SELECT $explode(${if (spark) "sequence(0, " + (LshPlanes * 64 - 1) + ")"
                                  else s"range(0, ${LshPlanes * 64})"}) AS k) kk),
       |signs AS (
       |  SELECT vec_id, p, CASE WHEN sum(x * w) > 0 THEN 1 ELSE 0 END AS b
       |  FROM flat JOIN planes USING (i) GROUP BY vec_id, p),
       |buckets AS (
       |  SELECT vec_id, CAST(sum($shl) AS BIGINT) AS bucket FROM signs GROUP BY vec_id)
       |""".stripMargin
  }

  private def registerEmbeddings(s: SparkSession, d: String): Unit =
    embeddings(s, d).createOrReplaceTempView("embeddings")

  /** Banded sign-LSH for e04 (OR-construction, the d06 pattern in embedding
    * space): [[NdBands]] independent band buckets of [[NdPlanesPerBand]]
    * hyperplanes each; a pair is a candidate iff it shares ≥1 band bucket,
    * then exact cosine verifies. Candidate generation is an equi-join on
    * (band, bucket) — never all-pairs — so the plan is a plain shuffle hash
    * join that scales with bucket occupancy. Recall is set by the banding
    * parameters (more planes/band → finer buckets at larger corpora).
    * Hyperplane weights reuse the md5 scheme, so both engines build
    * byte-identical buckets.
    */
  private def bandedLshSql(spark: Boolean): String = {
    val explode = if (spark) "explode" else "unnest"
    val strposFn = if (spark) "instr" else "strpos"
    val nPlanes = NdBands * NdPlanesPerBand
    val shl = if (spark) "shiftleft(b, CAST(p % NDP AS INT))".replace("NDP", NdPlanesPerBand.toString)
              else s"(b << (p % $NdPlanesPerBand))"
    s"""flat AS (
       |  SELECT vec_id, i, CAST(${if (spark) "element_at(embedding, CAST(i AS INT))"
                                   else "embedding[i]"} AS DOUBLE) AS x
       |  FROM embeddings ${if (spark) "LATERAL VIEW explode(sequence(1, size(embedding))) t AS i"
                            else ", UNNEST(range(1, len(embedding)+1)) AS t(i)"}),
       |planes AS (
       |  SELECT CAST(floor(k / 64.0) AS INT) AS p, (k % 64) + 1 AS i,
       |    ($strposFn('0123456789abcdef',
       |       substr(md5('nd:' || CAST(CAST(floor(k / 64.0) AS INT) AS STRING) || ':' ||
       |                  CAST((k % 64) + 1 AS STRING)), 1, 1)) - 1) - 7.5 AS w
       |  FROM (SELECT $explode(${if (spark) "sequence(0, " + (nPlanes * 64 - 1) + ")"
                                  else s"range(0, ${nPlanes * 64})"}) AS k) kk),
       |signs AS (
       |  SELECT vec_id, p, CASE WHEN sum(x * w) > 0 THEN 1 ELSE 0 END AS b
       |  FROM flat JOIN planes USING (i) GROUP BY vec_id, p),
       |bandbuckets AS (
       |  SELECT vec_id, CAST(floor(p / $NdPlanesPerBand.0) AS INT) AS band,
       |    CAST(sum($shl) AS BIGINT) AS bucket
       |  FROM signs GROUP BY vec_id, CAST(floor(p / $NdPlanesPerBand.0) AS INT)),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS ida, n.vec_id AS idb
       |  FROM bandbuckets q JOIN bandbuckets n
       |    ON q.band = n.band AND q.bucket = n.bucket AND q.vec_id < n.vec_id)
       |""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force exact cosine top-k: the correctness baseline. The query
    // side is broadcast (a small sample of the corpus), so the quadratic
    // score pass is a single shuffle-free stage over the vector table.
    "e01_cosine_topk" -> ((s, d) => {
      val e = embeddings(s, d)
      val q = e.filter(expr(QueryFilter))
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val pairs = broadcast(q)
        .join(e.select(col("vec_id").as("n_id"), col("embedding").as("nv")),
          col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          round(cosine(col("qv"), col("nv")), 6).as("cos"))
      topkOf(pairs)
    }),

    // Sign-LSH bucketing: per-bucket candidate generation + exact rerank.
    "e02_lsh_topk" -> ((s, d) => {
      registerEmbeddings(s, d)
      s.sql(
        s"""WITH ${lshBucketSql(spark = true)},
           |cand AS (
           |  SELECT q.vec_id AS q_id, n.vec_id AS n_id
           |  FROM buckets q JOIN buckets n
           |    ON q.bucket = n.bucket AND q.vec_id != n.vec_id
           |  WHERE q.vec_id % 10 = 0),
           |scored AS (
           |  SELECT q_id, n_id,
           |    round(cosine_sim(ea.embedding, eb.embedding), 6) AS cos
           |  FROM cand JOIN embeddings ea ON cand.q_id = ea.vec_id
           |            JOIN embeddings eb ON cand.n_id = eb.vec_id)
           |SELECT q_id, rank, n_id, cos FROM (
           |  SELECT q_id, n_id, cos,
           |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
           |  FROM scored) r
           |WHERE rank <= $TopK""".stripMargin)
    }),

    // IVF-style search: fixed centroids (vec_id < C), nearest-cell
    // assignment, queries probe the nprobe closest cells only.
    "e03_ivf_topk" -> ((s, d) => {
      val e = embeddings(s, d)
      val cent = e.filter(col("vec_id") < IvfCentroids)
        .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
      // nearest-centroid cell per vector (rounded cosine, centroid-id ties)
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("c_id").asc)
      val cells = e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("embedding"), col("c_id"),
          round(cosine(col("embedding"), col("cv")), 6).as("ccos"))
        .withColumn("crank", row_number().over(wAssign))
        .cache() // feeds both the assignment and the probe sides
      val assigned = cells.filter(col("crank") === 1)
        .select(col("vec_id"), col("embedding"), col("c_id").as("cell"))
      // each query probes its nprobe nearest cells
      val probes = cells.filter(expr(QueryFilter) && col("crank") <= IvfProbes)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
          col("c_id").as("cell"))
      val pairs = probes.join(assigned, Seq("cell"))
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          round(cosine(col("qv"), col("embedding")), 6).as("cos"))
        .distinct() // a neighbor can appear via multiple probed cells
      topkOf(pairs)
    }),

    // Near-duplicate vector pairs: banded sign-LSH candidates + exact
    // cosine verification (embedding-space analogue of d06's MinHash-LSH;
    // threshold tuned to the corpus's similarity range). Candidates come
    // from an equi-join on (band, bucket) — no all-pairs/NLJ anywhere.
    "e04_cosine_neardup_pairs" -> ((s, d) => {
      registerEmbeddings(s, d)
      s.sql(
        s"""WITH ${bandedLshSql(spark = true)},
           |scored AS (
           |  SELECT ida, idb, ea.label AS la, eb.label AS lb,
           |    round(cosine_sim(ea.embedding, eb.embedding), 6) AS cos
           |  FROM cand JOIN embeddings ea ON cand.ida = ea.vec_id
           |            JOIN embeddings eb ON cand.idb = eb.vec_id)
           |SELECT ida, idb, la, lb, cos FROM scored WHERE cos >= $NdThreshold""".stripMargin)
    })
  )

  private val CosSql =
    "round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6)"

  val oracle: Map[String, String] = Map(
    "e01_cosine_topk" ->
      s"""SELECT q_id, rank, n_id, cos FROM (
         |  SELECT ea.vec_id AS q_id, eb.vec_id AS n_id, $CosSql AS cos,
         |    row_number() OVER (PARTITION BY ea.vec_id
         |      ORDER BY $CosSql DESC, eb.vec_id ASC) AS rank
         |  FROM embeddings ea JOIN embeddings eb ON ea.vec_id != eb.vec_id
         |  WHERE ea.vec_id % 10 = 0) t
         |WHERE rank <= $TopK""".stripMargin,

    "e02_lsh_topk" ->
      s"""WITH ${lshBucketSql(spark = false)},
         |cand AS (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id
         |  FROM buckets q JOIN buckets n
         |    ON q.bucket = n.bucket AND q.vec_id != n.vec_id
         |  WHERE q.vec_id % 10 = 0),
         |scored AS (
         |  SELECT q_id, n_id, $CosSql AS cos
         |  FROM cand JOIN embeddings ea ON cand.q_id = ea.vec_id
         |            JOIN embeddings eb ON cand.n_id = eb.vec_id)
         |SELECT q_id, rank, n_id, cos FROM (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
         |  FROM scored) r
         |WHERE rank <= $TopK""".stripMargin,

    "e03_ivf_topk" ->
      s"""WITH cent AS (
         |  SELECT vec_id AS c_id, embedding AS cv FROM embeddings
         |  WHERE vec_id < $IvfCentroids),
         |cells AS (
         |  SELECT e.vec_id, e.embedding, c.c_id,
         |    round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]), 6) AS ccos,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]), 6) DESC,
         |               c.c_id ASC) AS crank
         |  FROM embeddings e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, embedding, c_id AS cell FROM cells WHERE crank = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, embedding AS qv, c_id AS cell FROM cells
         |  WHERE vec_id % 10 = 0 AND crank <= $IvfProbes),
         |pairs AS (
         |  SELECT DISTINCT p.q_id, a.vec_id AS n_id,
         |    round(list_cosine_similarity(p.qv::DOUBLE[], a.embedding::DOUBLE[]), 6) AS cos
         |  FROM probes p JOIN assigned a ON p.cell = a.cell AND p.q_id != a.vec_id)
         |SELECT q_id, rank, n_id, cos FROM (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
         |  FROM pairs) r
         |WHERE rank <= $TopK""".stripMargin,

    "e04_cosine_neardup_pairs" ->
      s"""WITH ${bandedLshSql(spark = false)},
         |scored AS (
         |  SELECT ida, idb, ea.label AS la, eb.label AS lb, $CosSql AS cos
         |  FROM cand JOIN embeddings ea ON cand.ida = ea.vec_id
         |            JOIN embeddings eb ON cand.idb = eb.vec_id)
         |SELECT ida, idb, la, lb, cos FROM scored WHERE cos >= $NdThreshold""".stripMargin
  )
}

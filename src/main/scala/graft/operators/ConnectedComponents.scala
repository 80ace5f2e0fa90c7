package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Min-label connected components over an undirected edge list — the
  * clustering step behind near-dup dedup (d10): every node gets the
  * MINIMUM doc_id of its component as its label.
  *
  * Two physical strategies behind one contract, chosen at runtime from the
  * measured edge count (the same shape as AQE's size-based join strategy
  * switch):
  *
  *  - **Driver union-find** below [[DriverMaxEdges]]: the near-dup
  *    subgraph of an already-mostly-unique corpus is tiny relative to the
  *    corpus (hundreds of edges at test SFs; the corpus-sized majority of
  *    singletons never enters), and a bounded `collect` + path-compressed
  *    union-find resolves it in microseconds where a distributed loop pays
  *    several scheduler round-trips per iteration. The bound keeps the
  *    collect ≤ ~16 MB of longs — the same "bounded metadata" budget as a
  *    broadcast-join build side.
  *  - **Large-star / small-star alternation** (Kiveris et al. 2014,
  *    "Connected Components in MapReduce and Beyond") above the bound:
  *    each round rewires every node toward its neighborhood minimum,
  *    halving component heights — O(log n) rounds on ANY graph shape,
  *    where plain min-label propagation needs rounds ≈ component DIAMETER
  *    (a chain of borderline near-dups pays one Spark job per hop).
  *
  * Both paths are value-identical (a property spec cross-checks the star
  * loop against union-find on random graphs) and the d10 oracle checks
  * whichever path ran end-to-end.
  */
object ConnectedComponents {

  /** Above this many distinct edges the distributed star loop runs;
    * below it the subgraph collects to a driver union-find. 2²⁰ edges ≈
    * 16 MB of id pairs — broadcast-sized, never corpus-sized.
    */
  val DriverMaxEdges: Long = 1L << 20

  /** Labels for every node that appears in `pairs` (columns `ida`, `idb`):
    * one `(doc_id, label)` row per distinct endpoint, `label` = component
    * minimum. Nodes absent from `pairs` (singletons) are the caller's
    * business — they never pay for the loop.
    */
  def minLabels(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    // canonical directed form big→small: one row per undirected edge
    val edges = pairs
      .select(greatest(col("ida"), col("idb")).as("src"),
        least(col("ida"), col("idb")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val n = edges.count()
    if (n == 0) s.emptyDataFrame.select(lit(0L).as("doc_id"), lit(0L).as("label"))
      .limit(0)
    else if (n <= DriverMaxEdges) driverUnionFind(s, edges)
    else starLabels(s, edges, n)
  }

  /** Bounded driver-side path: collect the (small) edge list, run
    * path-compressed union-find with min-id roots, parallelize the labels
    * back out.
    */
  private def driverUnionFind(s: SparkSession, edges: DataFrame): DataFrame = {
    import s.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != c) {
        val nxt = parent.getOrDefault(c, c); parent.put(c, r); c = nxt
      }
      r
    }
    val es = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].collect()
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // attach larger root under smaller ⇒ root == min id
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    es.iterator.flatMap { case (a, b) => Iterator(a, b) }.toSeq.distinct
      .map(x => (x, find(x))).toDF("doc_id", "label")
  }

  /** Distributed path: large-star/small-star to the fixpoint where every
    * edge is (member, component-root), then labels. AQE is off for the
    * loop body (its per-stage re-planning turns every round into several
    * sequential driver round-trips) and shuffle partitions are sized to
    * the SUBGRAPH, not the session default. localCheckpoint truncates
    * lineage each round — the edge table stays a flat scan instead of an
    * ever-deepening join tree.
    */
  private def starLabels(s: SparkSession, edges: DataFrame, n: Long): DataFrame = {
    def symmetrize(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    // large-star: every node attaches its LARGER neighbors to
    // m = min(N(u) ∪ {u}) — long chains collapse toward minima
    def largeStar(e: DataFrame): DataFrame = {
      val sym = symmetrize(e)
      val mins = sym.groupBy(col("src").as("u")).agg(min(col("dst")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.filter(col("dst") > col("src"))
        .join(mins, col("src") === col("u"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
    }
    // small-star: every node attaches its SMALLER neighbors (and itself)
    // to their minimum — stars flatten onto the true component root
    def smallStar(e: DataFrame): DataFrame = {
      val lows = symmetrize(e).filter(col("dst") < col("src"))
      val mins = lows.groupBy(col("src").as("u")).agg(min(col("dst")).as("m"))
      lows.join(mins, col("src") === col("u"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(mins.select(col("u").as("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
    }
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions",
      Math.min(200L, Math.max(8L, n / 250000L)).toString)
    var cur = edges.localCheckpoint(true)
    try {
      // per-round fixpoint probe: ONE tiny aggregate (count + src/dst
      // sums as DECIMAL(38,0) — BIGINT sums of large doc_ids overflow).
      // Metric equality is NECESSARY for set equality, so the exact
      // except() confirmation only runs when the metrics stall —
      // normally exactly once, on the final round.
      def metrics(e: DataFrame): (Long, java.math.BigDecimal, java.math.BigDecimal) = {
        val z = lit(0).cast("decimal(38,0)")
        val r = e.agg(count(lit(1)),
          coalesce(sum(col("src").cast("decimal(38,0)")), z),
          coalesce(sum(col("dst").cast("decimal(38,0)")), z)).head()
        (r.getLong(0), r.getDecimal(1), r.getDecimal(2))
      }
      var curM = metrics(cur)
      var converged = curM._1 == 0L
      var rounds = 0
      while (!converged) {
        rounds += 1
        // O(log² n) is the proven bound; 64 rounds covers any conceivable
        // component — exceeding it means a rewiring bug, fail loudly
        require(rounds <= 64, "large-star/small-star failed to converge")
        val next = smallStar(largeStar(cur)).localCheckpoint(true)
        val nextM = metrics(next)
        converged = nextM == curM && next.except(cur).isEmpty
        curM = nextM
        cur = next
      }
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    // at the fixpoint every edge is (member, component-root); roots keep
    // themselves (they appear only on the dst side)
    val nodes = symmetrize(edges).select(col("src").as("doc_id")).distinct()
    nodes
      .join(cur.groupBy(col("src").as("doc_id")).agg(min(col("dst")).as("l")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("l"), col("doc_id")).as("label"))
  }

  /** Test seam: run the distributed star path regardless of size. */
  private[graft] def starLabelsForTest(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(greatest(col("ida"), col("idb")).as("src"),
        least(col("ida"), col("idb")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    starLabels(pairs.sparkSession, edges, edges.count())
  }
}

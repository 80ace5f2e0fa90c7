package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Dev-only round-16 probes: the untried structural candidates on the
  * fifth-decade top rows, each measured shipped-vs-alternative through
  * Bench's protocol (noop sink, clearCache + GC between runs, warm pairs,
  * shipped shape run first and the alternative's SECOND leg compared
  * against the shipped SECOND leg).
  *
  *   - q02roll: rollup(Expand ×3 of every lineitem row) vs two-level
  *     re-aggregation (base groupBy + union of derived levels) — guide
  *     §2.3 "aggregate before you shuffle" applied to the Expand multiplier.
  *   - q04shj:  shipped SMJ l⋈o vs SHUFFLE_HASH-hinted build=orders —
  *     guide §3.1 (SHJ skips both sides' sorts; never probed in this repo).
  *   - q07shj:  same lever on o⋈c feeding the WindowGroupLimit.
  *   - d11agg:  per-doc top-3 via window (exchange + sort by doc) vs
  *     groupBy(doc).collect_list + in-row sort/slice (ObjectHashAggregate,
  *     no corpus-wide sort) — guide §2.4 (the sort exists only to rank
  *     doc-local rows).
  *   - e05dec:  decompose e05 = assign-scan+join term vs verify-join term;
  *     plus the full query under preferSortMergeJoin=false.
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args.drop(1).toSet else Set("q02roll")
    val spark = GraftSession.get("r16-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r16] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
      System.gc()
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def pair(label: String)(f: => DataFrame): Unit = {
      time(s"$label run1")(noop(f))
      time(s"$label run2 (warm)")(noop(f))
    }
    spark.range(1000).count()
    def dec(c: org.apache.spark.sql.Column, t: String = "decimal(12,2)") = c.cast(t)

    if (which("q02roll")) {
      pair("q02roll/shipped rollup (Expand)")(
        SparkEntry.queries("q02_global_rollup")(spark, d))
      def twoLevel: DataFrame = {
        val base = lineitem(spark, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_items"),
            sum(dec(col("l_quantity"))).as("sq")) // exact decimal partials
        val lvl1 = base.groupBy(col("l_returnflag"))
          .agg(sum(col("n_items")).as("n_items"), sum(col("sq")).as("sq"))
          .withColumn("l_linestatus", lit(null).cast("string"))
        val lvl0 = base
          .agg(sum(col("n_items")).as("n_items"), sum(col("sq")).as("sq"))
          .withColumn("l_returnflag", lit(null).cast("string"))
          .withColumn("l_linestatus", lit(null).cast("string"))
        base.unionByName(lvl1.select(base.columns.map(col).toSeq: _*))
          .unionByName(lvl0.select(base.columns.map(col).toSeq: _*))
          .select(col("l_returnflag"), col("l_linestatus"), col("n_items"),
            col("sq").cast("double").as("sum_qty"))
      }
      pair("q02roll/two-level re-agg")(twoLevel)
      pair("q02roll/shipped again (order control)")(
        SparkEntry.queries("q02_global_rollup")(spark, d))
    }

    if (which("q04shj")) {
      pair("q04shj/shipped (SMJ)")(
        SparkEntry.queries("q04_revenue_by_nation")(spark, d))
      def shj: DataFrame = {
        val s = queries.RelationalQueries.sizedForInput(spark, "q04shj", d, "lineitem")
        val l = lineitem(s, d); val o = orders(s, d)
        val c = customer(s, d); val n = nation(s, d)
        val perCust = l.join(o.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(4,2)") - dec(col("l_discount"), "decimal(4,2)")))
            .as("rev_part"), count(lit(1)).as("n_part"))
        perCust
          .join(c.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("rev_part")).cast("double").as("revenue"),
            sum(col("n_part")).as("n_rows"))
      }
      println(shj.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.take(160)).mkString("\n"))
      pair("q04shj/SHUFFLE_HASH build=orders,customer")(shj)
      pair("q04shj/shipped again (order control)")(
        SparkEntry.queries("q04_revenue_by_nation")(spark, d))
    }

    // q04: the custkey exchange tier exists only to attach n_name to the
    // per-customer partials. customer projected to (c_custkey, n_name) is
    // 15 M narrow rows at the fifth decade (~200-600 MB built) — broadcast
    // it into the l⋈o output stage and aggregate by n_name directly:
    // map-side partials collapse to 25 rows/partition, the 570 M-partial-row
    // custkey exchange disappears (guide §2.4/§3.1). sum(decimal) is exact
    // and associative, so regrouping by n_name instead of custkey-then-name
    // is value-identical. SHUFFLE_HASH on l⋈o drops both sort legs too.
    if (which("q04bc")) {
      pair("q04bc/shipped (perCust SMJ)")(
        SparkEntry.queries("q04_revenue_by_nation")(spark, d))
      def bc: DataFrame = {
        val s = queries.RelationalQueries.sizedForInput(spark, "q04bc", d, "lineitem")
        val l = lineitem(s, d); val o = orders(s, d)
        val c = customer(s, d); val n = nation(s, d)
        val cn = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name"))
        l.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
          .groupBy(col("n_name"))
          .agg(
            sum(dec(col("l_extendedprice")) *
              (lit(1).cast("decimal(4,2)") - dec(col("l_discount"), "decimal(4,2)")))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_rows"))
      }
      println(bc.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.take(160)).mkString("\n"))
      pair("q04bc/SHJ + broadcast c⋈n")(bc)
      pair("q04bc/shipped again (order control)")(
        SparkEntry.queries("q04_revenue_by_nation")(spark, d))
    }

    // q07: same lever — customer projected to (c_custkey, c_mktsegment) is
    // small enough to broadcast, which removes the o⋈c custkey exchange
    // and both SMJ sorts; the WindowGroupLimit's own mktsegment exchange
    // carries only per-partition top-3 rows.
    if (which("q07bc")) {
      pair("q07bc/shipped (SMJ)")(
        SparkEntry.queries("q07_topk_window")(spark, d))
      def bc: DataFrame = {
        import org.apache.spark.sql.expressions.Window
        val o = orders(spark, d); val c = customer(spark, d)
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.join(broadcast(c.select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      }
      println(bc.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")
          || l.contains("WindowGroupLimit"))
        .map(_.take(160)).mkString("\n"))
      pair("q07bc/broadcast customer")(bc)
      pair("q07bc/shipped again (order control)")(
        SparkEntry.queries("q07_topk_window")(spark, d))
    }

    if (which("q07shj")) {
      pair("q07shj/shipped (SMJ)")(
        SparkEntry.queries("q07_topk_window")(spark, d))
      def shj: DataFrame = {
        import org.apache.spark.sql.expressions.Window
        val o = orders(spark, d); val c = customer(spark, d)
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.join(c.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      }
      println(shj.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")
          || l.contains("WindowGroupLimit"))
        .map(_.take(160)).mkString("\n"))
      pair("q07shj/SHUFFLE_HASH build=customer")(shj)
      pair("q07shj/shipped again (order control)")(
        SparkEntry.queries("q07_topk_window")(spark, d))
    }

    if (which("d11agg")) {
      pair("d11agg/shipped (window)")(
        SparkEntry.queries("d11_tfidf_terms")(spark, d))
      def agg: DataFrame = {
        documents(spark, d).createOrReplaceTempView("documents")
        spark.sql(
          """WITH tf AS (
            |  SELECT doc_id, t, count(*) AS tf
            |  FROM (SELECT doc_id, explode(split(text, ' ')) AS t FROM documents) x
            |  GROUP BY doc_id, t),
            |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
            |scored AS (
            |  SELECT doc_id, t,
            |    round(tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df.df), 6) AS tfidf
            |  FROM tf JOIN df USING (t)),
            |top3 AS (
            |  SELECT doc_id, slice(array_sort(collect_list(struct(tfidf, t)),
            |    (a, b) -> CASE WHEN a.tfidf > b.tfidf THEN -1
            |                   WHEN a.tfidf < b.tfidf THEN 1
            |                   WHEN a.t < b.t THEN -1
            |                   WHEN a.t > b.t THEN 1 ELSE 0 END), 1, 3) AS s
            |  FROM scored GROUP BY doc_id)
            |SELECT doc_id, CAST(pos + 1 AS INT) AS rnk, e.t AS term, e.tfidf
            |FROM top3 LATERAL VIEW posexplode(s) x AS pos, e""".stripMargin)
      }
      pair("d11agg/groupBy collect_list top-3")(agg)
      pair("d11agg/shipped again (order control)")(
        SparkEntry.queries("d11_tfidf_terms")(spark, d))
    }

    if (which("eq")) {
      // pre-screen value equality of the rewrites (the real gate stays the
      // DuckDB oracle at sf0.01 once a rewrite ships)
      def eq(label: String, a: DataFrame, b: DataFrame): Unit = {
        val ca = a.columns.sorted.toSeq
        val diff = a.select(ca.map(col): _*).exceptAll(b.select(ca.map(col): _*))
          .union(b.select(ca.map(col): _*).exceptAll(a.select(ca.map(col): _*)))
          .count()
        println(s"[r16] eq/$label: ${if (diff == 0) "IDENTICAL" else s"DIFFERS ($diff rows)"}")
      }
      val shippedQ02 = SparkEntry.queries("q02_global_rollup")(spark, d)
      val base = lineitem(spark, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"), sum(dec(col("l_quantity"))).as("sq"))
      val lvl1 = base.groupBy(col("l_returnflag"))
        .agg(sum(col("n_items")).as("n_items"), sum(col("sq")).as("sq"))
        .withColumn("l_linestatus", lit(null).cast("string"))
      val lvl0 = base.agg(sum(col("n_items")).as("n_items"), sum(col("sq")).as("sq"))
        .withColumn("l_returnflag", lit(null).cast("string"))
        .withColumn("l_linestatus", lit(null).cast("string"))
      val twoLevel = base.unionByName(lvl1.select(base.columns.map(col).toSeq: _*))
        .unionByName(lvl0.select(base.columns.map(col).toSeq: _*))
        .select(col("l_returnflag"), col("l_linestatus"), col("n_items"),
          col("sq").cast("double").as("sum_qty"))
      eq("q02 two-level vs rollup", shippedQ02, twoLevel)

      val shippedD11 = SparkEntry.queries("d11_tfidf_terms")(spark, d)
      documents(spark, d).createOrReplaceTempView("documents")
      val aggD11 = spark.sql(
        """WITH tf AS (
          |  SELECT doc_id, t, count(*) AS tf
          |  FROM (SELECT doc_id, explode(split(text, ' ')) AS t FROM documents) x
          |  GROUP BY doc_id, t),
          |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
          |scored AS (
          |  SELECT doc_id, t,
          |    round(tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df.df), 6) AS tfidf
          |  FROM tf JOIN df USING (t)),
          |top3 AS (
          |  SELECT doc_id, slice(array_sort(collect_list(struct(tfidf, t)),
          |    (a, b) -> CASE WHEN a.tfidf > b.tfidf THEN -1
          |                   WHEN a.tfidf < b.tfidf THEN 1
          |                   WHEN a.t < b.t THEN -1
          |                   WHEN a.t > b.t THEN 1 ELSE 0 END), 1, 3) AS s
          |  FROM scored GROUP BY doc_id)
          |SELECT doc_id, CAST(pos + 1 AS INT) AS rnk, e.t AS term, e.tfidf
          |FROM top3 LATERAL VIEW posexplode(s) x AS pos, e""".stripMargin)
      eq("d11 agg-top3 vs window", shippedD11, aggD11)
    }

    // d20: the shipped shape pays TWO regex scans per pattern (count via
    // regexp_extract_all + replace via regexp_replace). split() yields both
    // in ONE scan — for a pattern that cannot match the empty string,
    // concat_ws(sep, split(s, re, -1)) ≡ regexp_replace(s, re, sep) and
    // size(split(s, re, -1)) - 1 ≡ match count (limit -1 keeps trailing
    // empties, so the identity is exact; same Java regex engine both ways).
    // Email count+replace share one split array; the phone count stays a
    // scan of t (not clean1) to mirror the shipped semantics by
    // construction. 4 regex scans -> 3, and split's segment slicing is
    // cheaper than extract_all's per-match group machinery.
    def d20split: DataFrame = {
      documentsDense(spark, d).createOrReplaceTempView("documents")
      val emailRe = "[a-z0-9._-]+@[a-z0-9.-]+"
      val phoneRe = "\\\\+1-555-[0-9]{4}"
      spark.sql(
        s"""WITH aug AS (
           |  SELECT doc_id,
           |    concat(text,
           |      ' contact user', CAST(doc_id AS STRING), '@mail-', source, '.net',
           |      repeat(concat(' cc backup', CAST(doc_id AS STRING), '@org-', source, '.com'),
           |             CAST(doc_id % 3 AS INT)),
           |      ' call +1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) AS t
           |  FROM documents),
           |seg AS (
           |  SELECT doc_id, t, split(t, '$emailRe', -1) AS se FROM aug),
           |red AS (
           |  SELECT doc_id,
           |    CAST(size(se) - 1 AS BIGINT) AS n_emails,
           |    CAST(size(split(t, '$phoneRe', -1)) - 1 AS BIGINT) AS n_phones,
           |    concat_ws('<PHONE>',
           |      split(concat_ws('<EMAIL>', se), '$phoneRe', -1)) AS clean
           |  FROM seg)
           |SELECT doc_id, n_emails, n_phones,
           |  length(clean) AS clean_len, md5(clean) AS clean_hash
           |FROM red""".stripMargin)
    }

    if (which("d20split")) {
      pair("d20split/shipped (extract_all+replace)")(
        SparkEntry.queries("d20_pii_redact")(spark, d))
      pair("d20split/split-once")(d20split)
      pair("d20split/shipped again (order control)")(
        SparkEntry.queries("d20_pii_redact")(spark, d))
    }

    if (which("eqd20")) {
      val ca = Seq("doc_id", "n_emails", "n_phones", "clean_len", "clean_hash")
      val a = SparkEntry.queries("d20_pii_redact")(spark, d).select(ca.map(col): _*)
      val b = d20split.select(ca.map(col): _*)
      val diff = a.exceptAll(b).union(b.exceptAll(a)).count()
      println(s"[r16] eq/d20 split vs shipped: ${if (diff == 0) "IDENTICAL" else s"DIFFERS ($diff rows)"}")
    }

    if (which("eqjoin")) {
      def eq2(label: String, a: DataFrame, b: DataFrame): Unit = {
        val ca = a.columns.toSeq
        val diff = a.exceptAll(b.select(ca.map(col): _*))
          .union(b.select(ca.map(col): _*).exceptAll(a)).count()
        println(s"[r16] eq/$label: ${if (diff == 0) "IDENTICAL" else s"DIFFERS ($diff rows)"}")
      }
      locally {
        val l = lineitem(spark, d); val o = orders(spark, d)
        val c = customer(spark, d); val n = nation(spark, d)
        val cn = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name"))
        val bc = l.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
          .groupBy(col("n_name"))
          .agg(
            sum(dec(col("l_extendedprice")) *
              (lit(1).cast("decimal(4,2)") - dec(col("l_discount"), "decimal(4,2)")))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_rows"))
        eq2("q04 bc vs shipped",
          SparkEntry.queries("q04_revenue_by_nation")(spark, d), bc)
      }
      locally {
        import org.apache.spark.sql.expressions.Window
        val o = orders(spark, d); val c = customer(spark, d)
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        val bc = o.join(broadcast(c.select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        eq2("q07 bc vs shipped",
          SparkEntry.queries("q07_topk_window")(spark, d), bc)
      }
    }

    if (which("e05dec")) {
      // term (a): the persisted-assign + embeddings join feeding pair
      // generation (everything ABOVE the quadratic verify)
      time("e05dec/a assign⋈embeddings (no verify)") {
        val ds = queries.VectorQueries.registerEmbeddings(spark, d)
        val sfx = queries.VectorQueries.ivfIndexViews(ds, d, trainSample = false)
        val n = ds.sql(
          s"""SELECT count(*) FROM ivf_assign_$sfx a
             |JOIN (SELECT vec_id, embedding,
             |        sqrt(dot_product(embedding, embedding)) AS nrm
             |      FROM embeddings) e ON a.vec_id = e.vec_id""".stripMargin)
          .head().getLong(0)
        println(s"[r16] e05 assign rows = $n")
      }
      pair("e05dec/b full e05 (shipped)")(
        SparkEntry.queries("e05_semantic_dedup")(spark, d))
    }
    spark.stop()
  }
}

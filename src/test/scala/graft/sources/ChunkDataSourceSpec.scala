package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.cawd.{ChunkType, OrcChunker, ParquetChunker}

/** The graft-chunks DataSource V2 provider must agree exactly with the
  * direct chunker API, and its column pruning must reach the reader (a
  * metadata-only projection reads zero data bytes).
  */
class ChunkDataSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = GraftSession.get("chunk-source-spec")
  private var dir: String = _

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("chunk-source").toString
    val df = spark.range(0, 5000).select(
      col("id"), concat(lit("r-"), col("id") % 11).as("s"))
    df.orderBy("id").coalesce(1).write.mode("overwrite").orc(s"$dir/orc")
    df.orderBy("id").coalesce(1).write.mode("overwrite").parquet(s"$dir/pq")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def firstPart(d: String, suffix: String): String =
    new java.io.File(d).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(suffix))
      .get.getAbsolutePath

  test("graft-chunks source matches the direct chunker, both formats") {
    val orcDirect = OrcChunker.chunk(firstPart(s"$dir/orc", ".orc"), 0,
      OrcChunker.StripeColumn)
    val orcRead = spark.read.format("graft-chunks")
      .option("format", "orc").load(s"$dir/orc")
      .select("seq", "chunkType", "start", "size", "parentSeq")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).sortBy(_._1)
    assert(orcRead.toSeq == orcDirect.map(c =>
      (c.seq, c.chunkType, c.start, c.size, c.parentSeq)))

    val pqDirect = ParquetChunker.chunk(firstPart(s"$dir/pq", ".parquet"), 0)
    val pqRead = spark.read.format("graft-chunks")
      .load(s"$dir/pq") // parquet is the default format
      .select("seq", "chunkType", "size").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(pqRead.toSeq == pqDirect.map(c => (c.seq, c.chunkType, c.size)))
  }

  test("distributed partition planning returns the same partitions as driver-side") {
    val driverSide = spark.read.format("graft-chunks")
      .option("format", "orc").load(s"$dir/orc")
      .select("file", "seq", "chunkType", "size").collect()
      .map(_.toString).sorted
    // threshold 1 forces the plan-files-as-a-Spark-job path even for this
    // one-file directory
    val distributed = spark.read.format("graft-chunks")
      .option("format", "orc").option("distributedPlanThreshold", "1")
      .load(s"$dir/orc")
      .select("file", "seq", "chunkType", "size").collect()
      .map(_.toString).sorted
    assert(distributed.sameElements(driverSide),
      "distributed planning must produce identical chunk partitions")
  }

  test("pushed filters prune files and chunk metas at plan time") {
    import org.apache.spark.sql.sources.{EqualTo, Filter, StringEndsWith}
    val props = Map("path" -> s"$dir/orc", "format" -> "orc")
    def partitions(filters: Array[Filter]): Array[ChunkInputPartition] = {
      val b = new ChunkScanBuilder(props)
      assert(b.pushFilters(filters).isEmpty, "supported filters leave no residual")
      b.build().toBatch.planInputPartitions().map(_.asInstanceOf[ChunkInputPartition])
    }
    val all = partitions(Array.empty)
    val pruned = partitions(Array(EqualTo("chunkType", ChunkType.StripeData)))
    assert(pruned.flatMap(_.metas).forall(_.chunkType == ChunkType.StripeData))
    assert(pruned.flatMap(_.metas).length < all.flatMap(_.metas).length,
      "chunkType pushdown must shrink the planned metas")
    assert(pruned.flatMap(_.metas).nonEmpty)
    // file predicates prune whole files before any metadata read
    assert(partitions(Array(EqualTo("file", "/no/such/file.orc"))).isEmpty)
    assert(partitions(Array(StringEndsWith("file", ".orc"))).flatMap(_.metas).length ==
      all.flatMap(_.metas).length)

    // end-to-end: the pushed scan returns exactly the rows a residual
    // filter would keep, the plan advertises the pushdown, and no Filter
    // node survives (the predicate is fully absorbed by the source)
    val df = spark.read.format("graft-chunks").option("format", "orc")
      .load(s"$dir/orc")
    val filtered = df.filter(col("chunkType") === ChunkType.StripeData)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[EqualTo(chunkType"), s"plan:\n$plan")
    assert(!plan.contains("+- Filter"), s"no residual Filter expected:\n$plan")
    assert(filtered.count() ==
      df.collect().count(_.getAs[String]("chunkType") == ChunkType.StripeData))
  }

  test("signature projection hashes; pruned scan plan carries only requested columns") {
    val df = spark.read.format("graft-chunks")
      .option("format", "orc").load(s"$dir/orc")
    val sigs = df.select("chunkType", "signature")
      .filter(col("chunkType") === ChunkType.StripeData).collect()
    assert(sigs.nonEmpty && sigs.forall(_.getAs[Array[Byte]]("signature").length == 20))

    val pruned = df.select("file", "chunkType")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("signature") && !plan.contains("content"),
      s"pruned plan must not materialize signature/content:\n$plan")
    assert(pruned.count() > 0)
  }
}

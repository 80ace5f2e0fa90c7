package graft

/** Dev-only: is Spark's banded levenshtein(l, r, k) actually cheaper than
  * the full DP at this corpus's string lengths?
  */
object LevBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("lev-bench")
    import spark.implicits._
    val n = 200000
    val df = spark.range(n).map { i =>
      val r = new scala.util.Random(i)
      def s(len: Int) = (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      (s(500), s(500))
    }.toDF("a", "b").cache()
    df.count()
    def time(label: String, exprStr: String): Unit = {
      val t0 = System.nanoTime()
      df.selectExpr(s"sum($exprStr)").collect()
      println(f"[lev] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    time("warm full", "levenshtein(a, b)")
    time("full DP", "levenshtein(a, b)")
    time("threshold k=101", "levenshtein(a, b, 101)")
    time("threshold k=26", "levenshtein(a, b, 26)")
    spark.stop()
  }
}

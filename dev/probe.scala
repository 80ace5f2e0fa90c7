// Profiling scratchpad — run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --jars target/scala-2.13/columnarawarededupspark_2.13-0.1.0.jar \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     -I dev/probe.scala
val sf = "/root/testdata/sf0.1"
def time(name: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime()
  f
  println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
}
def run(name: String): Unit =
  time(name)(graft.SparkEntry.queries(name)(spark, sf)
    .write.format("noop").mode("overwrite").save())

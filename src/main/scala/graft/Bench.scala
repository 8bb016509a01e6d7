package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.trim.toIntOption)
      .getOrElse(Sessions.defaultCpus)
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Full materialization of every result column via the noop sink —
    // .count() would let ColumnPruning strip unreferenced aggregate
    // expressions and under-measure the real query cost.
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    // Warm up codegen/JIT/classloading on the tiny SF so the timings below
    // measure the engine, not first-query JVM warmup (~17 s cold).
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try { run(fn, warmDir) } catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failing query must surface, not silently record a near-zero
      // time that deflates the total: it lands in "errors" with time -1.
      val ok = try { run(fn, sfDir); true }
      catch { case e: Throwable => errors += s"$name: ${e.getClass.getSimpleName}"; false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map(e => "\"" + e.replace("\"", "'") + "\"")
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    // Stdout inside sbt gets an [info] prefix that defeats line-oriented
    // JSON parsers, so the metric also lands in a file the driver can read.
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LOCAL.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"bench: could not write $outPath: $e") }
    PlanCache.clear(spark)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}

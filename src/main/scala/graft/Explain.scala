package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: dumps `.explain("formatted")` for every declared query so
  * the physical plans can be reviewed for scan pruning (PushedFilters /
  * ReadSchema), join strategy (broadcast vs sort-merge), and codegen
  * coverage (WholeStageCodegen spans). Run:
  * `sbt "runMain graft.Explain /root/testdata/sf0.01"`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"\n======== $name ========")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}

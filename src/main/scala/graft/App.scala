package graft

import org.apache.spark.sql.SparkSession

/** CLI entry (SURVEY.md §2.1 S2): `graft.App <lang> <track> [sfDir]` runs
  * the flagship sentiment query, or `graft.App --query <name> [sfDir]`
  * runs any declared query by name.
  *
  * Unlike the reference (`app.py:7-10` prints usage but falls through to
  * an IndexError when argv is short), bad arguments exit(2) with usage —
  * the latent bug is fixed, not ported.
  */
object App {
  private val usage =
    """usage: graft.App <lang> <track> [sfDir]
      |       graft.App --query <name> [sfDir]
      |       graft.App --list""".stripMargin

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usage); sys.exit(2) }
    if (args(0) == "--list") {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try args.toList match {
      case "--query" :: name :: rest =>
        val dir = rest.headOption.getOrElse("/root/testdata/sf0.01")
        SparkEntry.queries.get(name) match {
          case Some(fn) => fn(spark, dir).show(50, truncate = false)
          case None =>
            System.err.println(s"unknown query '$name'; try --list")
            sys.exit(2)
        }
      case lang :: track :: rest if !lang.startsWith("--") =>
        val dir = rest.headOption.getOrElse("/root/testdata/sf0.01")
        operators.TextPipeline.sentimentByLabel(spark, dir, lang, track)
          .show(50, truncate = false)
      case _ =>
        System.err.println(usage); sys.exit(2)
    } finally spark.stop()
  }
}

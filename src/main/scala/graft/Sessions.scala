package graft

import org.apache.spark.sql.SparkSession

/** Single session factory for every entry point (Verify, Bench, App,
  * Explain, StreamDemo, tests): local[min(cpus,32)] with
  * shuffle.partitions = threads, UTC, and the nanos-timestamp read flag
  * set at BUILD time — so reading `events.parquet` is order-independent
  * (no hidden conf mutation required first; see Tables.events). */
object Sessions {
  def defaultCpus: Int = math.min(Runtime.getRuntime.availableProcessors, 32)

  def local(cpus: Int = defaultCpus): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink format layer (SURVEY.md §2.1/§2.10 beyond parquet):
  * uniform write/read over the formats this Spark build ships — parquet,
  * orc (columnar), json, csv (row formats, schema-on-read). The reference
  * only ever wrote newline-framed text to S3 (`ProcessStreamData.py:28`);
  * this is the engine-grade generalization: a user points any query's
  * input or output at any of these formats.
  *
  * Scale notes per format: parquet/orc carry column pruning + predicate
  * pushdown + splittable compression (the 100 TB defaults); json/csv are
  * scan-everything interchange formats — supported, but the library
  * treats them as ingest/egress, not as the analytical store.
  */
object Formats {

  val Supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  private def require_(fmt: String): Unit =
    require(Supported.contains(fmt),
      s"unsupported format '$fmt' (supported: ${Supported.mkString(", ")})")

  /** Write `df` at `path` in `fmt`. CSV keeps a header so the file is
    * self-describing for re-ingest. */
  def write(df: DataFrame, path: String, fmt: String): Unit = {
    require_(fmt)
    val w = df.write.mode("overwrite").format(fmt)
    (if (fmt == "csv") w.option("header", "true") else w).save(path)
  }

  /** Hive-style partitioned write: one directory per distinct value tuple
    * of `partitionCols` (`part=a/part=b/…`). THE layout lever at 100 TB —
    * a reader filtering on a partition column scans only the matching
    * directories (partition pruning happens at the file index, before any
    * row is read; the plan shows it as `PartitionFilters`, not
    * `PushedFilters`). Choose low-cardinality columns (date, lang,
    * source): one directory per value, and a query's scan cost drops from
    * |table| to |matching partitions|.
    *
    * `maxRecordsPerFile` caps file size under skew (a hot partition
    * splits into several files instead of one huge unsplittable-for-json
    * file). */
  def writePartitioned(df: DataFrame, path: String, fmt: String,
                       partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 0L): Unit = {
    require_(fmt)
    require(partitionCols.nonEmpty, "writePartitioned: no partition columns")
    val w = df.write.mode("overwrite").format(fmt)
      .partitionBy(partitionCols: _*)
    val w1 = if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile.toString) else w
    (if (fmt == "csv") w1.option("header", "true") else w1).save(path)
  }

  /** Read `path` as `fmt`. An explicit schema skips inference (which
    * would cost an extra full pass on json/csv at scale) and pins types
    * that csv would otherwise read as strings. */
  def read(spark: SparkSession, path: String, fmt: String,
           schema: Option[StructType] = None): DataFrame = {
    require_(fmt)
    val r0 = spark.read.format(fmt)
    // inferSchema is a csv-only option (json always infers); setting it on
    // other readers would be a silent no-op
    val r1 = schema.fold(if (fmt == "csv")
      r0.option("inferSchema", "true") else r0)(r0.schema)
    (if (fmt == "csv") r1.option("header", "true") else r1).load(path)
  }
}

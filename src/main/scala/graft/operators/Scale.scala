package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-out utilities (100 TB posture, SURVEY.md §7): the two join
  * shapes Catalyst can't pick automatically — key-salting for skewed
  * shuffles and bucketed table layout for shuffle-free co-located joins.
  * (AQE's skew-join handles moderate skew at runtime; salting is the
  * static fallback when one key dominates an entire stage, e.g. a null
  * key or a celebrity user.)
  */
object Scale {

  /** Salted equi-join: spread each fact key over `salt` sub-keys and
    * replicate the (small-ish) right side once per salt value. The fact
    * side's salt is a deterministic hash of the whole row, so the join
    * stays reproducible (no rand()) while a hot key fans out over `salt`
    * reducers. Result is row-identical to the plain join.
    *
    * Cost model: right side shuffles `salt`× its size; use only when the
    * left side's key skew stalls a stage and the right side is too big to
    * broadcast outright. */
  def saltedJoin(fact: DataFrame, right: DataFrame, factKey: String,
                 rightKey: String, salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive (got $salt) — pmod(x, 0) is " +
      "NULL and a descending sequence() would silently empty the join")
    require(!fact.columns.contains("_salt") && !right.columns.contains("_salt"),
      "saltedJoin: inputs must not already carry a '_salt' column — " +
        "withColumn would replace it and the final drop would remove both, " +
        "breaking row-identity with the plain join")
    val factSalted = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)))
    val rightSalted = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    factSalted
      .join(rightSalted,
        factSalted(factKey) === rightSalted(rightKey) &&
          factSalted("_salt") === rightSalted("_salt"))
      .drop("_salt")
  }

  /** Write both sides bucketed+sorted on the join key so the join needs
    * no Exchange at read time (bucket-pruned, sort-merge ready). This is
    * the layout a 100 TB fact table should be materialized in when it is
    * joined on the same key repeatedly. Returns the saved table names. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): String = {
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    table
  }
}

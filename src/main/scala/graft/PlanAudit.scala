package graft

import org.apache.spark.sql.DataFrame

/** Programmatic scale-red-flag audit of a DataFrame's physical plan —
  * the same checks PlanAuditSpec sweeps every declared query with,
  * exposed so users can gate THEIR queries before a 100 TB run:
  *
  * {{{
  * val flags = graft.PlanAudit.redFlags(myQuery)
  * require(flags.isEmpty, flags.mkString("; "))
  * }}}
  *
  * These are the plan shapes that stay invisible at test scale and
  * explode at 1000 executors: an unbounded all-pairs join, a broadcast
  * nested-loop whose build side isn't provably tiny, and a window
  * sorting the whole dataset in one task.
  */
object PlanAudit {

  /** Red-flag strings for `df`'s executed plan (empty = clean).
    * `allowBnlj`: pass true when the query provably broadcasts a tiny
    * side (query-point sets, centroid tables, calendar dimensions) —
    * the audit can see the operator but not the cardinality proof. */
  def redFlags(df: DataFrame, allowBnlj: Boolean = false): Seq[String] = {
    val p = df.queryExecution.executedPlan.toString
    val flags = Seq.newBuilder[String]
    if (p.contains("CartesianProduct"))
      flags += "CartesianProduct: unbounded all-pairs join — never survives scale"
    if (!allowBnlj && p.contains("BroadcastNestedLoopJoin"))
      flags += ("BroadcastNestedLoopJoin: verify the broadcast side is " +
        "provably tiny (or pass allowBnlj = true once proven)")
    if (p.linesIterator.exists(_.contains("Window")) &&
        p.contains("SinglePartition"))
      flags += "Window over SinglePartition: whole-dataset single-task sort"
    flags.result()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sequence packing (q71): sharded greedy context assignment. */
class PackingSpec extends SparkSpec {

  test("context assignment is a consistent running cut: offsets, straddles, coverage") {
    val ctx = 64
    val rows = Packing.packContexts(spark, sf0001, ctxLen = ctx, nShards = 4)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tok = r.getAs[Long]("n_tokens")
      val cum = r.getAs[Long]("cum_tokens")
      val start = r.getAs[Long]("context_id")
      val end = r.getAs[Long]("end_context")
      assert(tok >= 1, "whitespace split never yields zero tokens")
      assert(start == (cum - tok) / ctx && end == (cum - 1) / ctx)
      assert(end >= start)
      // a doc can only straddle as many boundaries as its token count spans
      assert(end - start <= tok / ctx + 1)
    }
    // within each (lang, shard): cum is strictly increasing by n_tokens
    // in doc_id order — the packing order is deterministic
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
      .foreach { case (_, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
        var run = 0L
        sorted.foreach { r =>
          run += r.getAs[Long]("n_tokens")
          assert(r.getAs[Long]("cum_tokens") == run)
        }
      }
  }

  test("packing summary accounting: contexts hold all tokens, fill <= 1") {
    val ctx = 64
    val s = Packing.packingSummary(spark, sf0001, ctxLen = ctx, nShards = 4)
      .collect()
    assert(s.nonEmpty)
    s.foreach { r =>
      val toks = r.getAs[Long]("sum_tokens")
      val nCtx = r.getAs[Long]("n_contexts")
      // allocated contexts must cover the tokens, with less than one
      // context of per-shard tail slack each
      assert(nCtx * ctx >= toks)
      assert((nCtx - 4) * ctx < toks, "more than one tail context per shard")
      val fillBp = r.getAs[Long]("fill_bp")
      assert(fillBp > 0L && fillBp <= 10000L)
      // exact integer basis points of the same ratio
      assert(fillBp == toks * 10000L / (nCtx * ctx))
      assert(r.getAs[Long]("n_straddling") <= r.getAs[Long]("n_docs"))
    }
    // totals match the corpus: every doc packed exactly once
    val total = s.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf0001).count())
  }

  test("packing shuffles once on (lang, shard), no single global partition") {
    val plan = Packing.packContexts(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the window must be partitioned (not the WindowExec global-sort
    // warning shape): partitioning clause present on both columns
    assert(plan.contains("Window"))
    assert(!plan.contains("SinglePartition"),
      "packing must never collapse to one partition")
  }
}

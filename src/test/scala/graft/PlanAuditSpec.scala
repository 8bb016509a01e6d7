package graft

/** Mechanical scale-invariant audit over EVERY declared query's physical
  * plan — the regressions these catch are the ones that stay invisible at
  * test scale and explode at 100 TB:
  *
  *  - a CartesianProduct (an unbounded all-pairs pass),
  *  - a BroadcastNestedLoopJoin that is not one of the audited tiny-side
  *    crosses (query-point sets, centroid tables, single-row counts),
  *  - a Window over SinglePartition (a corpus-sized single-task sort),
  *  - a documents/lineitem parquet scan that reads every column for a
  *    narrower projection (pushdown/pruning silently lost).
  *
  * PLANS.md documents the intended shape per query; this spec pins the
  * red-flag subset mechanically so a refactor can't reintroduce one.
  */
class PlanAuditSpec extends SparkSpec {

  // queries whose plans legitimately carry a BroadcastNestedLoopJoin:
  // every one broadcasts a provably tiny side (audited in PLANS.md)
  private val allowedBnlj = Set(
    "q23_cosine_topk", "q24_ann_lsh", "q25_embedding_neardup",
    "q36_label_centroids", "q37_ivf_topk", "q48_ivf_multiprobe",
    "q45_contamination", "q50_contamination_bloom", "q53_tfidf_topterms",
    "q66_quantization_audit", "q70_pq_adc",
    // q76 range-joins the calendar-bounded distinct-days dimension
    "q76_rolling_active")

  private lazy val plans: Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf0001).queryExecution.executedPlan.toString
    }

  test("no query plan contains a CartesianProduct") {
    plans.foreach { case (name, p) =>
      assert(!p.contains("CartesianProduct"),
        s"$name: CartesianProduct in plan — an all-pairs pass at scale")
    }
  }

  test("BroadcastNestedLoopJoin only where a tiny side is proven") {
    plans.foreach { case (name, p) =>
      if (p.contains("BroadcastNestedLoopJoin"))
        assert(allowedBnlj.contains(name),
          s"$name: unaudited BroadcastNestedLoopJoin — broadcast side must " +
            "be provably tiny and the query added to the audited set")
    }
  }

  test("no Window runs over a single global partition") {
    plans.foreach { case (name, p) =>
      val windowed = p.linesIterator.exists(_.contains("Window"))
      if (windowed)
        assert(!p.contains("SinglePartition"),
          s"$name: Window over SinglePartition — corpus-sized one-task sort")
    }
  }

  test("every documents scan prunes to the columns the query needs") {
    // full schema is doc_id,text,lang,source,n_chars (5 cols); any scan
    // reading all 5 has lost column pruning — no current query needs all
    plans.foreach { case (name, p) =>
      p.linesIterator.filter(l => l.contains("ReadSchema") &&
          l.contains("documents")).foreach { l =>
        val nCols = l.substring(l.indexOf("struct<")).count(_ == ':')
        assert(nCols < 5,
          s"$name: documents scan reads all columns — pruning lost:\n$l")
      }
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Unit coverage for similarity search (SURVEY.md §2.12 X3). */
class SimilaritySpec extends SparkSpec {

  test("hyperplanes are deterministic ±1 and fixed across calls") {
    assert(Similarity.Hyperplanes.size == Similarity.Planes)
    assert(Similarity.Hyperplanes.forall(_.size == Similarity.Dim))
    assert(Similarity.Hyperplanes.flatten.forall(w => w == 1.0 || w == -1.0))
    assert(Similarity.Hyperplanes == Similarity.Hyperplanes)
  }

  test("brute-force top-k: cosine in [-1,1], ranks dense from 1, ordered desc") {
    val rows = Similarity.cosineTopK(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0))
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      val ranked = g.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq == (1L to g.length).toSeq)
      val cos = ranked.map(_.getAs[Double]("cosine")).toSeq
      assert(cos == cos.sorted.reverse, "cosine must be non-increasing in rank")
    }
  }

  test("ANN top-k is a subset-ranking of brute-force candidates (bucket recall)") {
    val ann = Similarity.annTopK(spark, sf0001).collect()
    assert(ann.nonEmpty)
    // every ANN hit must appear in the full brute-force ranking with the
    // same rounded cosine (bucketing can only drop candidates, not alter
    // scores)
    val brute = Similarity.cosineTopK(spark, sf0001, k = 1000).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("cosine")).toMap
    ann.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      assert(brute.get(key).contains(r.getAs[Double]("cosine")))
    }
  }

  test("embedding near-dup: symmetric-free pairs above threshold") {
    val nd = Similarity.embeddingNearDup(spark, sf0001).collect()
    assert(nd.nonEmpty)
    assert(nd.forall(_.getAs[Double]("cosine") >= 0.35))
    assert(nd.forall(r => r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b")))
  }
}

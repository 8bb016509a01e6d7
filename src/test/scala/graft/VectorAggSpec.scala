package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorMean
import graft.operators.Similarity

/** A4 typed Aggregator + IVF coarse quantizer (SURVEY.md §2.5, §2.12 X3). */
class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("VectorMean: element-wise mean with partial/merge correctness") {
    val df = Seq(
      (0, Seq(1.0, 2.0, 3.0)),
      (0, Seq(3.0, 4.0, 5.0)),
      (1, Seq(10.0, 0.0, -10.0))).toDF("g", "v")
      .repartition(3) // force merges across partials
    val m = udaf(VectorMean)
    val out = df.groupBy("g").agg(m(col("v")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(2.0, 3.0, 4.0))
    assert(out(1) == Seq(10.0, 0.0, -10.0))
  }

  test("VectorMean: empty group and null rows don't blow up") {
    val m = udaf(VectorMean)
    val df = Seq((0, Option(Seq(1.0, 1.0))), (0, Option.empty[Seq[Double]]))
      .toDF("g", "v")
    val c = df.groupBy("g").agg(m(col("v"))).collect()(0).getSeq[Double](1)
    assert(c == Seq(1.0, 1.0), "nulls must be skipped, not counted")
  }

  test("label centroids: 64 dims per label, all labels present") {
    val c = Similarity.labelCentroids(spark, sf0001)
    val perLabel = c.groupBy("label").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perLabel.values.forall(_ == 64))
    assert(perLabel.keySet == (0L to 9L).toSet)
  }

  test("IVF top-k: results are a bucket-restricted subset of brute force") {
    val ivf = Similarity.ivfTopK(spark, sf0001).collect()
    assert(ivf.nonEmpty)
    val brute = Similarity.cosineTopK(spark, sf0001, k = 1000).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("cosine")).toMap
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      assert(brute.get(key).contains(r.getAs[Double]("cosine")),
        s"IVF hit $key must carry the exact brute-force cosine")
    }
  }
}

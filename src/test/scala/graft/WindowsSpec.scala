package graft

import org.apache.spark.sql.functions._

import graft.operators.Windows

/** Distribution window functions (W1+): invariants the oracle's exact
  * hash-compare doesn't articulate. */
class WindowsSpec extends SparkSpec {

  test("order distribution: quartiles in 1..4, ratios in [0,1], cume ends at 1") {
    val d = Windows.orderDistribution(spark, sf0001)
    d.collect().foreach { r =>
      val q = r.getAs[Long]("quartile")
      assert(q >= 1 && q <= 4, r)
      val pr = r.getAs[Double]("pct_rank")
      val cu = r.getAs[Double]("cume")
      assert(pr >= 0.0 && pr <= 1.0 && cu > 0.0 && cu <= 1.0, r)
    }
    // the highest-priced order of every customer has cume_dist exactly 1
    val tops = d.groupBy("o_custkey").agg(max("cume").as("m"))
    assert(tops.filter(col("m") =!= 1.0).count() == 0)
    assert(d.count() == Tables.orders(spark, sf0001).count())
  }
}

package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import graft.operators.Relational

/** Relational segmentation devices — exact-quartile semantics on planted
  * order histories. */
class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int): Timestamp =
    Timestamp.valueOf(LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(d.toLong))

  test("rfmSegments (q176): histogram-elected quartile cutoffs, exact scores") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rfm").toString
    // 8 customers on a fully controlled metric grid:
    //   recency days   0,1,2,3,4,5,6,7  → cutoffs 1/3/5 → scores 4,4,3,3,2,2,1,1
    //   frequency      1,1,2,2,3,3,4,4  → cutoffs 1/2/3 → scores 1,1,2,2,3,3,4,4
    //   dollars        10..80 step 10   → cutoffs 20/40/60 → scores 1,1,2,2,3,3,4,4
    val rDays = Seq(0, 1, 2, 3, 4, 5, 6, 7)
    val freq = Seq(1, 1, 2, 2, 3, 3, 4, 4)
    val dollars = Seq(10, 20, 30, 40, 50, 60, 70, 80)
    val refDay = 100
    var ok = 0L
    val rows = (0 until 8).flatMap { i =>
      val cust = (i + 1).toLong
      val last = refDay - rDays(i)
      // last order carries the remainder so cents sum to dollars(i)·100
      (0 until freq(i)).map { j =>
        ok += 1
        val price = if (j == freq(i) - 1) (dollars(i) - (freq(i) - 1)).toDouble
                    else 1.0
        (ok, cust, "O", price, day(last - (freq(i) - 1 - j)), "1-URGENT")
      }
    }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val out = Relational.rfmSegments(spark, dir).collect()
    assert(out.length == 4, s"expected 4 cells, got ${out.length}")
    def cell(seg: String, r: Long, f: Long, m: Long): (Long, Long, Long) = {
      val row = out.find(x => x.getAs[String]("segment") == seg &&
        x.getAs[Long]("r_score") == r && x.getAs[Long]("f_score") == f &&
        x.getAs[Long]("m_score") == m)
        .getOrElse(fail(s"missing cell ($seg,$r,$f,$m): ${out.mkString(";")}"))
      (row.getAs[Long]("n_customers"), row.getAs[Long]("n_orders"),
        row.getAs[Long]("cents"))
    }
    assert(cell("b_recent", 4L, 1L, 1L) == ((2L, 2L, 3000L)))
    assert(cell("b_recent", 3L, 2L, 2L) == ((2L, 4L, 7000L)))
    assert(cell("c_at_risk", 2L, 3L, 3L) == ((2L, 6L, 11000L)))
    assert(cell("c_at_risk", 1L, 4L, 4L) == ((2L, 8L, 15000L)))
  }

  test("rfmSegments: single-customer corpus lands every metric in the top cell") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rfm1").toString
    Seq((1L, 1L, "O", 42.0, day(5), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val out = Relational.rfmSegments(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    // one customer: every cutoff equals its own value, nothing exceeds →
    // r_score 4 (fresh), f/m score 1 (nothing to beat)
    assert(r.getAs[String]("segment") == "b_recent")
    assert(r.getAs[Long]("r_score") == 4L && r.getAs[Long]("f_score") == 1L &&
      r.getAs[Long]("m_score") == 1L)
    assert(r.getAs[Long]("n_customers") == 1L &&
      r.getAs[Long]("cents") == 4200L)
  }
}

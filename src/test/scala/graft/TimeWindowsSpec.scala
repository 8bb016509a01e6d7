package graft

import org.apache.spark.sql.functions._

import graft.operators.{JsonOps, Relational, TimeWindows}

/** Unit coverage for event-time windows, JSON/codec ops, and the range
  * join (SURVEY.md §2.5 A5, §2.9 T2, §2.3 P1-P5, §2.6 J4). */
class TimeWindowsSpec extends SparkSpec {

  test("tumbling windows partition events exactly (no loss, no dup)") {
    val total = TimeWindows.tumblingHourly(spark, sf0001)
      .agg(sum("n_events")).head.getLong(0)
    assert(total == Tables.events(spark, sf0001).count())
  }

  test("sliding 1h/30m windows count every event exactly twice") {
    val total = TimeWindows.slidingHourHalf(spark, sf0001)
      .agg(sum("n_events")).head.getLong(0)
    assert(total == 2 * Tables.events(spark, sf0001).count())
  }

  test("session windows: events conserved; sessions start-ordered per user") {
    val sess = TimeWindows.userSessions(spark, sf0001)
    val total = sess.agg(sum("n_events")).head.getLong(0)
    assert(total == Tables.events(spark, sf0001).count())
    assert(sess.count() > 0)
  }

  test("json extract: k values parse for every event (props is total)") {
    val r = JsonOps.propsExtract(spark, sf0001)
      .agg(sum("n_events").as("n"), sum("sum_k").as("s")).head
    assert(r.getLong(0) == Tables.events(spark, sf0001).count())
    assert(r.getLong(1) > 0)
  }

  test("base64 codec round-trips every document") {
    JsonOps.base64Roundtrip(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("n_roundtrip_ok") == r.getAs[Long]("n_docs"))
    }
  }

  test("range join: conversions have positive bounded gaps") {
    val rows = Relational.viewToPurchase(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Double]("avg_gap_sec")
      assert(g > 0 && g <= 1800)
    }
  }

  test("grouping sets: grand total row equals table count") {
    val gs = Relational.docGroupingSets(spark, sf0001)
    val grand = gs.filter(col("lang") === "(all)" && col("source") === "(all)")
      .select("n_docs").head.getLong(0)
    assert(grand == Tables.documents(spark, sf0001).count())
  }

  test("approx distinct users is within 10% of exact") {
    Relational.approxDistinctUsersFull(spark, sf0001).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.10,
        s"approx $approx vs exact $exact drifted >10%")
    }
  }
}

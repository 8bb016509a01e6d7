package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** Scale utilities: salted join equivalence + bucketed co-located join
  * (shuffle-free at read time). */
class ScaleSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("l_orderkey").count()
    val salted = Scale.saltedJoin(li, o, "l_orderkey", "o_orderkey", salt = 8)
      .groupBy("l_orderkey").count()
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salt column spreads rows across the full salt range") {
    val li = Tables.lineitem(spark, sf0001)
    val salts = li.withColumn("_salt",
        pmod(xxhash64(li.columns.map(col).toIndexedSeq: _*), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts == 8, s"expected all 8 salt values used, got $salts")
  }

  test("bucketed tables join without an Exchange (co-located layout)") {
    // warehouse dir is static config — tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    Scale.writeBucketed(
      Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice"),
      "orders_bkt", "o_orderkey", 8)
    Scale.writeBucketed(
      Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity"),
      "lineitem_bkt", "l_orderkey", 8)
    // at sf0.001 the planner prefers broadcast; disable it so the test
    // demonstrates the sort-merge path a 100 TB fact-fact join would take
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf0001).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
    }
  }
}

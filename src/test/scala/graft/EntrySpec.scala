package graft

/** Driver-contract smoke: entry() returns rows; every declared query runs
  * at sf0.001 and every query has an oracle (or a documented exemption). */
class EntrySpec extends SparkSpec {

  test("entry returns >0 rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all declared queries run and return >0 rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every query key has an oracleSql key (hash-match gate coverage)") {
    // No exemptions: since round 6 even q34 has a portable hashed oracle
    // (exact counts + each-engine-validates-its-own-sketch verdict).
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries missing oracle SQL: $missing")
  }
}

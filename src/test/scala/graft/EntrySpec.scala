package graft

/** Driver-contract smoke: entry() returns rows; every declared query runs
  * and every oracle key maps to a real query. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("every query executes on sf0.001 and is non-empty") {
    val bad = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        if (fn(spark, sf()).count() >= 0) None else Some(name)
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }
}

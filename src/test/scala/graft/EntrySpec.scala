package graft

/** Driver-contract smoke: entry() returns rows; every declared query runs
  * and every oracle key maps to a real query. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("entry works under a bare driver-style session (no graft configs)") {
    // the driver smoke-checks entry with its own session; simulate one
    // with none of our configs (nanos conf must self-apply at read time)
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val bare = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").appName("driver-smoke").getOrCreate()
      assert(SparkEntry.entry(bare).count() > 0)
    } finally {
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
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

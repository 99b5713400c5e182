package graft

import org.apache.spark.sql.Row

/** The q103 approx production twin (t-digest thresholds + narrow
  * filter): window-free plan, score-monotone buckets, full coverage,
  * and bucket sizes bounded against the exact NTILE twin. */
class CcnetApproxSpec extends SparkSpec {

  private lazy val approx: Array[Row] =
    QueriesScore.ccnetBucketsApprox(spark, sf()).collect()
  private lazy val exact: Array[Row] =
    Queries.all("q103_ccnet_buckets")(spark, sf()).collect()

  test("plan is window-free and sort-join-free (no rank anywhere)") {
    val p = QueriesScore.ccnetBucketsApprox(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"approx twin grew a window:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"threshold must broadcast, not sort-join:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row threshold frame must broadcast:\n$p")
  }

  test("buckets cover every doc and are score-monotone") {
    assert(approx.map(_.getLong(1)).sum == exact.map(_.getLong(1)).sum,
      "approx buckets must cover the corpus exactly")
    val byBucket = approx.map(r => r.getInt(0) -> r).toMap
    // degenerate thresholds (tie mass / coincident t-digest quantiles)
    // would EMPTY a bucket — surface that as a readable failure, not a
    // NoSuchElementException in the dominance loop below
    assert(byBucket.keySet == (1 to approx.length).toSet,
      s"expected buckets 1..${approx.length}, got ${byBucket.keySet}")
    // strict threshold rule: every bucket-b score > q_cut >= every
    // bucket-(b+1) score, so min(b) must strictly beat max(b+1)
    for (b <- 1 until approx.length)
      assert(byBucket(b).getLong(2) > byBucket(b + 1).getLong(3),
        s"bucket $b does not dominate bucket ${b + 1}")
  }

  test("bucket sizes are within 15% of the exact terciles") {
    val n = exact.map(_.getLong(1)).sum
    val exactByBucket = exact.map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (r <- approx) {
      val b = r.getInt(0)
      val drift = math.abs(r.getLong(1) - exactByBucket(b))
      assert(drift <= math.max(2L, n * 15 / 100),
        s"bucket $b: approx ${r.getLong(1)} vs exact ${exactByBucket(b)} " +
          s"drifts more than 15% of n=$n")
    }
  }
}

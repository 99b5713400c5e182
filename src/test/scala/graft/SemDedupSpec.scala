package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeansCluster, SemDedup}

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("sqDistFixedCols matches the literal-centroid kernel") {
    val df = Seq((1L, Seq(0.5, 1.0), Seq(0.0, 0.0))).toDF("id", "a", "b")
    val got = df.select(SemDedup.sqDistFixedCols(col("a"), col("b")))
      .collect().head.getLong(0)
    assert(got == math.floor(0.25 * 1e10).toLong +
      math.floor(1.0 * 1e10).toLong)
  }

  test("keepFirst: lower id shadows near dups, clusters never interact") {
    val assigned = Seq(
      // cluster 0: 1 and 2 are near (dist 0.01² * 2), 5 is far
      (1L, 0, Seq(0.0, 0.0)), (2L, 0, Seq(0.01, 0.01)),
      (5L, 0, Seq(3.0, 3.0)),
      // cluster 1: 3 is near to 2's POSITION but in another cluster —
      // must be kept; 4 duplicates 3 exactly and is shadowed
      (3L, 1, Seq(0.01, 0.01)), (4L, 1, Seq(0.01, 0.01)))
      .toDF("id", "cluster", "v")
    val got = SemDedup.keepFirst(assigned, maxDistFp = 1000000000L) // 0.1
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> true, 2L -> false, 5L -> true,
      3L -> true, 4L -> false))
  }

  test("keepFirst over lloyd: threshold 0 keeps exact-dup groups' min id only") {
    val rows = Seq(
      0L -> Seq(0.0, 0.0), 1L -> Seq(10.0, 10.0),
      2L -> Seq(0.0, 0.0),   // exact dup of 0
      3L -> Seq(10.0, 10.0), // exact dup of 1
      4L -> Seq(0.2, 0.0))
    val assigned = KMeansCluster.lloyd(rows.toDF("id", "v"), k = 2, iters = 2)
    val got = SemDedup.keepFirst(assigned, maxDistFp = 0L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(0L -> true, 1L -> true, 2L -> false, 3L -> false,
      4L -> true))
  }
}

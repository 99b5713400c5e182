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

  test("keepFirstIncremental: stored ∪ delta verdicts equal from-scratch") {
    // 40 rows, 3 clusters, duplicate vectors sprinkled across the
    // stored/delta boundary (crawl order: delta ids all higher)
    val rows = (0L until 40L).map { i =>
      (i, (i % 3).toInt, Seq((i % 7).toDouble, (i % 3).toDouble))
    }
    val all = rows.toDF("id", "cluster", "v")
    val stored = all.filter(col("id") < 25)
    val delta = all.filter(col("id") >= 25)
    val tau = 1000000000L // 0.1 — exact dups only
    val scratch = SemDedup.keepFirst(all, tau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val inc = SemDedup.keepFirstIncremental(stored, delta, tau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(inc.keySet == (25L until 40L).toSet)
    assert(inc == scratch.view.filterKeys(_ >= 25L).toMap)
    // stored verdicts are untouched by arrivals — keepFirst on the
    // stored slice alone already equals the from-scratch restriction
    val storedOnly = SemDedup.keepFirst(stored, tau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(storedOnly == scratch.view.filterKeys(_ < 25L).toMap)
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

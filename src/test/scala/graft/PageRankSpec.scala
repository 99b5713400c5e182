package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** Integer PageRank (q72's kernel). */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  test("a directed ring is a fixpoint: every node keeps rank = scale") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("s", "d")
    val got = PageRank.run(edges, "s", "d", iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 4)
    // contrib = r/1, new = 0.15*scale + 0.85*r; at r = scale that is scale
    got.values.foreach(r => assert(r == Scale))
  }

  test("a star concentrates rank on the hub, leaves keep the floor") {
    // 5 leaves -> hub; hub -> leaf 1
    val edges = (1L to 5L).map(l => (l, 0L)) :+ (0L, 1L)
    val got = PageRank.run(edges.toDF("s", "d"), "s", "d", 3)
      .as[(Long, Long)].collect().toMap
    assert(got(0L) > 2 * Scale, s"hub rank ${got(0L)}")
    // leaves 2..5 receive nothing: exactly the damping floor after r1
    (2L to 5L).foreach(l => assert(got(l) < Scale / 2))
    assert(got(1L) > got(2L)) // leaf 1 gets the hub's mass back
  }

  test("dangling nodes leak mass: total rank decays below n*scale") {
    // 0 -> 1, 1 has no out-edges
    val edges = Seq((0L, 1L)).toDF("s", "d")
    val got = PageRank.run(edges, "s", "d", 4).as[(Long, Long)].collect()
    assert(got.map(_._2).sum < 2 * Scale)
  }

  test("partitioning-invariant: identical ranks for any layout") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 4000).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
    def ranks(parts: Int) = PageRank.run(
        edges.toDF("s", "d").repartition(parts), "s", "d", 3)
      .as[(Long, Long)].collect().toMap
    assert(ranks(1) == ranks(16))
  }

  test("self-loops and duplicate edges are ignored") {
    val base = Seq((0L, 1L), (1L, 0L))
    val noisy = base ++ Seq((0L, 0L), (0L, 1L), (0L, 1L), (1L, 1L))
    val a = PageRank.run(base.toDF("s", "d"), "s", "d", 3)
      .as[(Long, Long)].collect().toMap
    val b = PageRank.run(noisy.toDF("s", "d"), "s", "d", 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}

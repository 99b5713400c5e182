package graft

import graft.operators.Bfs

/** Multi-source BFS distances (q83's kernel). */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
                  rounds: Int): Map[Long, Long] =
    Bfs.distances(edges.toDF("s", "d"), "s", "d", sources, rounds)
      .as[(Long, Long)].collect().toMap

  test("chain graph: distance equals hop count, capped by rounds") {
    val chain = (0L until 6L).sliding(2).map(p => (p(0), p(1))).toSeq
    val got = run(chain, Seq(0L), rounds = 3)
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 9999L, 5L -> 9999L)) // beyond the round budget stays inf
    val full = run(chain, Seq(0L), rounds = 5)
    assert(full(5L) == 5L)
  }

  test("multi-source takes the minimum over seeds") {
    val chain = (0L until 7L).sliding(2).map(p => (p(0), p(1))).toSeq
    val got = run(chain, Seq(0L, 5L), rounds = 6)
    assert(got(6L) == 1L) // nearer to seed 5
    assert(got(4L) == 4L) // edges are directed; only 0 reaches 4
  }

  test("unreachable nodes keep the sentinel (directed edges)") {
    val got = run(Seq((1L, 2L), (3L, 2L)), Seq(1L), rounds = 4)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 9999L))
  }

  test("partitioning-invariant") {
    val rnd = new scala.util.Random(41)
    val edges = (1 to 3000).map(_ =>
      (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
    def d(parts: Int) = Bfs.distances(
        edges.toDF("s", "d").repartition(parts), "s", "d", Seq(0L, 7L), 4)
      .as[(Long, Long)].collect().toMap
    assert(d(1) == d(16))
  }
}

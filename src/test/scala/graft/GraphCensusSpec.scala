package graft

import graft.operators.{Curation, Graphs}

/** Triangle/triplet census + bounded shared-gram edge builder
  * (q144/q145 kernels) on crafted micro-graphs.
  */
class GraphCensusSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(es: (Long, Long)*) = es.toSeq.toDF("x", "y")

  test("triangle census on K4: 4 triangles, 6 edges, cc = 1") {
    val k4 = pairs((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = Graphs.triangleCensus(k4)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // triplets = 4 * C(3,2) = 12; cc = 3*4/12 = 1 -> 1e6 ppm
    assert(r == ((4L, 6L, 4L, 12L, 1000000L)))
  }

  test("path graph has zero triangles but open triplets") {
    val path = pairs((1L, 2L), (2L, 3L), (3L, 4L))
    val r = Graphs.triangleCensus(path)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // degrees 1,2,2,1 -> triplets = 1 + 1 = 2
    assert(r == ((4L, 3L, 0L, 2L, 0L)))
  }

  test("empty edge list yields an all-zero census row, not a crash") {
    val r = Graphs.triangleCensus(pairs())
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("kCoreCensus peels pendant tail one node per round, core stays") {
    // triangle {1,2,3} + pendant chain 3-4-5: the 2-core is the
    // triangle; peeling eats the chain one node per round
    val g = pairs((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = Graphs.kCoreCensus(g, k = 2, rounds = 3)
      .orderBy("round")
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((0, 5L, 5L), (1, 4L, 4L), (2, 3L, 3L), (3, 3L, 3L)))
  }

  test("kCoreCensus on an all-pendant graph empties and stays empty") {
    val star = pairs((1L, 2L), (1L, 3L)) // center degree 2, leaves 1
    val got = Graphs.kCoreCensus(star, k = 2, rounds = 2)
      .orderBy("round")
      .as[(Int, Long, Long)].collect().toSeq
    // round 1 drops the leaves; their edges vanish, so the center
    // vanishes with them (nodes are counted as edge endpoints)
    assert(got == Seq((0, 3L, 2L), (1, 0L, 0L), (2, 0L, 0L)))
  }

  test("sharedGramEdges pairs docs on a common rare gram only") {
    val docs = Seq(
      (1L, "a b c d e f g h tail1"),
      (2L, "a b c d e f g h tail2"),          // shares the 8-gram with 1
      (3L, "z y x w v u t s tail3")           // disjoint
    ).toDF("doc_id", "text")
    val es = Curation.sharedGramEdges(docs, "doc_id", "text", 8, 10)
      .as[(Long, Long)].collect().toSet
    assert(es == Set((1L, 2L)))
  }

  test("sharedGramEdges df cap drops boilerplate grams entirely") {
    // 5 docs all sharing one 8-gram: maxDf=3 excludes it -> no edges
    val docs = (1L to 5L).map(i => (i, s"a b c d e f g h tail$i"))
      .toDF("doc_id", "text")
    assert(Curation.sharedGramEdges(docs, "doc_id", "text", 8, 3)
      .count() == 0L)
    // maxDf=5 admits it -> C(5,2) = 10 edges
    assert(Curation.sharedGramEdges(docs, "doc_id", "text", 8, 5)
      .count() == 10L)
  }

  test("sharedGramEdgesSharded: exact parity with the one-shot at passes 1/3/7") {
    // the real corpus slice exercises cross-slice edge dedup (a doc
    // pair can share grams landing in different hash slices)
    val docs = Tables.documents(spark, sf()).limit(200)
    val oneShot = Curation.sharedGramEdges(docs, "doc_id", "text", 8, 10)
      .as[(Long, Long)].collect().toSet
    assert(oneShot.nonEmpty, "fixture must produce edges")
    for (p <- Seq(1, 3, 7)) {
      val sharded = Curation
        .sharedGramEdgesSharded(docs, "doc_id", "text", 8, 10, p)
        .as[(Long, Long)].collect().toSet
      assert(sharded == oneShot, s"parity broken at passes=$p")
    }
  }

  test("degrees counts both endpoints") {
    val d = Graphs.degrees(pairs((1L, 2L), (1L, 3L)))
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation: bridged triangles stay distinct where CC merges") {
    // two triangles joined by one bridge edge 3-4: CC sees ONE
    // component; 2-round frequency-argmax LPA keeps the sides apart
    val g = pairs((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val labels = Graphs.labelPropagation(g, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // hand-computed synchronous rounds (argmax by count desc, label asc):
    // r1: 1->2 2->1 3->1 4->3 5->4 6->4
    // r2: 1->1 2->1 3->1 4->4 5->3 6->3
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
    // the left triangle is one community; no left label leaks right
    assert(Set(4L, 5L, 6L).map(labels) == Set(3L, 4L))
    assert(graft.operators.Dedup.connectedComponents(
      g.toDF("doc_a", "doc_b"))
      .select("component").distinct().count() == 1L)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Fusion, Similarity}

/** Diversified rerank (MMR) + contrastive pair mining behavior. */
class MmrMiningSpec extends SparkSpec {
  import spark.implicits._

  private def cands(rows: (Long, Long, Seq[Double])*) =
    rows.toDF("doc_id", "rel_fp", "v")

  test("mmr pick 1 is the most relevant candidate, recorded without a diversity term") {
    val got = Fusion.mmrDiversify(
      cands((1L, 100L, Seq(0.0)), (2L, 300L, Seq(5.0)), (3L, 200L, Seq(9.0))),
      picks = 1, relW = 4L, distDiv = 1L).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == (1L, 2L, 1200L))
  }

  test("mmr prefers a distant lower-relevance candidate over a clone of pick 1") {
    // doc 2 = top relevance; doc 3 is its exact clone (dist 0) with
    // slightly lower rel; doc 1 is far away with much lower rel.
    // Pure relevance would pick 3 second; MMR must pick 1.
    val got = Fusion.mmrDiversify(
      cands((1L, 100L, Seq(0.0)), (2L, 300L, Seq(5.0)), (3L, 299L, Seq(5.0))),
      picks = 2, relW = 1L, distDiv = 1000L).collect().map(_.getLong(1))
    assert(got.toSeq == Seq(2L, 1L))
    // dist(1,2) = floor(25*1e10) => mmr(1) = 100 + 25e10/1000 >> 299
  }

  test("mmr integer objective matches hand arithmetic across rounds") {
    val got = Fusion.mmrDiversify(
      cands((10L, 50L, Seq(1.0)), (20L, 40L, Seq(2.0)), (30L, 30L, Seq(0.0))),
      picks = 3, relW = 2L, distDiv = 7L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pick1: doc 10, mmr = 100
    // round2: d(20,10)=1e10, d(30,10)=1e10; mmr20 = 80 + 1e10/7,
    //         mmr30 = 60 + 1e10/7 -> doc 20
    // round3: doc 30 minDist = min(1e10 to 10, 4e10 to 20) = 1e10
    val d = 10000000000L
    assert(got.toSeq == Seq((1L, 10L, 100L), (2L, 20L, 80L + d / 7),
      (3L, 30L, 60L + d / 7)))
  }

  test("mmr refuses unbounded candidate frames") {
    val big = spark.range(5000).select(col("id").as("doc_id"),
      lit(1L).as("rel_fp"), array(col("id").cast("double")).as("v"))
    intercept[IllegalArgumentException] {
      Fusion.mmrDiversify(big, 3, 1L, 1L)
    }
  }

  test("minePairs splits positives and hard negatives by label, k each") {
    val e = Tables.embeddings(spark, sf()).select(
      col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("v"),
      col("label").cast("long").as("label"))
    val got = Similarity.minePairs(e, e.filter(col("id") < 2), k = 3)
      .collect()
    assert(got.length == 12) // 2 anchors x {same, diff} x 3
    val labels = e.select(col("id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val (qId, vecId, same) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      assert(vecId != qId)
      assert((labels(qId) == labels(vecId)) == same,
        s"row $r mislabeled same_label")
    }
    // ranks within each (anchor, side) are 1..3
    got.groupBy(r => (r.getLong(0), r.getBoolean(2))).foreach {
      case (_, rows) =>
        assert(rows.map(_.getInt(4)).sorted.toSeq == Seq(1, 2, 3))
    }
  }
}

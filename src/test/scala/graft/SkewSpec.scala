package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-stage agg equals plain groupBy, including heavy skew") {
    // 90% of rows on one key — the shape salting exists for
    val rnd = new scala.util.Random(5)
    val df = (1 to 5000).map { i =>
      val k = if (rnd.nextInt(10) < 9) "hot" else s"cold${rnd.nextInt(5)}"
      (i.toLong, k, rnd.nextInt(1000) / 100.0)
    }.toDF("id", "k", "v")
    val salted = Skew.saltedCountSum(df, "k", "v", "id", 16)
      .orderBy(col("k"))
    val plain = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("k"))
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("salted join equals plain join under a hot key") {
    val rnd = new scala.util.Random(7)
    // 90% of fact rows hit key 1 — the hot-reducer shape
    val fact = (1 to 4000).map { i =>
      (i.toLong, if (rnd.nextInt(10) < 9) 1L else rnd.nextInt(50).toLong)
    }.toDF("row_id", "k")
    val dim = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "label")
    val salted = Skew.saltedJoin(fact, dim, "k", saltBy = "row_id", salts = 8)
      .select(col("row_id"), col("k"), col("label"))
      .orderBy(col("row_id"))
    val plain = fact.join(dim, Seq("k"))
      .select(col("row_id"), col("k"), col("label"))
      .orderBy(col("row_id"))
    assert(salted.collect().toSeq == plain.collect().toSeq)
    // and the salted plan joins on (k, _salt): hot key spread across salts
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), p)
  }
}

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
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.GroupedTopK

/** Window-free grouped top-k (q66's kernel). */
class GroupedTopKSpec extends SparkSpec {
  import spark.implicits._

  test("agrees with the row_number window under any partitioning") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 2000).map { i =>
      (s"g${i % 7}", s"k$i", rnd.nextInt(100).toDouble, i.toLong, (i * 2).toLong)
    }
    val df = rows.toDF("g", "key", "score", "a", "b").repartition(16)
    val viaAgg = df.groupBy(col("g"))
      .agg(GroupedTopK.topK(3)(col("score"), col("key"), col("a"), col("b"))
        .as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("col.key").as("key"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("key").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("g"), col("rank"), col("key"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k return all their rows, ordered") {
    val df = Seq(("g", 2.0, "b", 1L, 1L), ("g", 2.0, "a", 2L, 2L),
      ("g", 9.0, "c", 3L, 3L)).toDF("g", "score", "key", "a", "b")
    val got = df.groupBy(col("g"))
      .agg(GroupedTopK.topK(10)(col("score"), col("key"), col("a"), col("b"))
        .as("top"))
      .select(explode(col("top")))
      .select(col("col.key")).as[String].collect().toSeq
    // score desc, then key asc on the tie
    assert(got == Seq("c", "a", "b"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeansCluster, Similarity}
import graft.plans.SqDistFixedExpr

class SqDistFixedExprSpec extends SparkSpec {
  import spark.implicits._

  test("native kernel is bit-identical to the HOF formulation on real embeddings") {
    val e = Tables.embeddings(spark, sf()).select(
      col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val centroid = e.filter(col("id") === 0)
      .collect()(0).getSeq[Double](1).toSeq
    val both = e.select(col("id"),
      KMeansCluster.sqDistFixed(col("v"), centroid).as("native"),
      KMeansCluster.sqDistFixedHof(col("v"), centroid).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0L)
    assert(both.filter(col("native") > 0).count() > 0L)
  }

  test("null contract matches zip_with: length mismatch and null element -> null") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (3L, Seq[java.lang.Double](1.0, 3.0), Seq[java.lang.Double](1.0, 1.0))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        SqDistFixedExpr.sqDistFixed(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> None, 2L -> None,
      3L -> Some(math.floor(4.0 * 1e10).toLong)))
  }

  test("sum overflow throws (ANSI-Add parity) instead of wrapping") {
    val df = Seq((Seq(1e160, 1e160), Seq(0.0, 0.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(SqDistFixedExpr.sqDistFixed(col("a"), col("b"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected an ArithmeticException in the cause chain, got: $e")
  }

  test("SQL registration works and the kernel stays inside codegen") {
    SqDistFixedExpr.register(spark)
    val r = spark.sql(
      "SELECT sqdist_fixed(array(1.0d, 2.0d), array(0.0d, 0.0d)) AS d")
    assert(r.collect()(0).getLong(0) == 5L * 10000000000L)
    // a non-literal frame keeps the expression in a codegen'd Project
    val e = Tables.embeddings(spark, sf()).select(
      Similarity.asDouble(col("embedding")).as("v"))
    val plan = e.select(SqDistFixedExpr.sqDistFixed(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"),
      s"sqdist_fixed should participate in WholeStageCodegen:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.plans.DotDoubleExpr

class DotDoubleExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(seed: Int, n: Int, dims: Int): Seq[(Seq[Double], Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    def v() = Seq.fill(dims)(rnd.nextDouble() * 2e3 - 1e3)
    (1 to n).map(_ => (v(), v()))
  }

  test("native expression is bit-identical to the zip_with/aggregate fold") {
    // both are strict left-to-right double folds, so equality is exact
    // (===), not approximate — any reordering in the native loop would
    // show up as a low-bit difference on these wide-magnitude values
    val df = vecs(5, 2000, 64).toDF("a", "b")
      .select(Similarity.dotDouble(col("a"), col("b")).as("native"),
        Similarity.dotDoubleHof(col("a"), col("b")).as("hof"))
    assert(df.filter(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("null array input yields null; empty arrays yield 0.0") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("a", "b")
      .select(Similarity.dotDouble(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("SQL registration works") {
    DotDoubleExpr.register(spark)
    val r = spark.sql(
      "SELECT dot_double(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS v")
      .collect().head
    assert(r.getDouble(0) == 32.0)
  }

  test("participates in WholeStageCodegen (the HOF version did not)") {
    // spark.range base (literal frames constant-fold to LocalTableScan
    // — see verify skill gotchas); `*(n)` prefixes mark codegen stages
    val base = spark.range(100)
      .select(array(col("id").cast("double"),
        (col("id") + 1).cast("double")).as("a"))
    val native = base
      .select(Similarity.dotDouble(col("a"), col("a")).as("d"))
    val pNative = native.queryExecution.executedPlan.toString
    assert(pNative.linesIterator.exists(l =>
      l.contains("*(") && l.contains("Project")),
      s"native dot must codegen:\n$pNative")
    assert(native.agg(sum("d")).collect().head.getDouble(0) > 0)
  }
}

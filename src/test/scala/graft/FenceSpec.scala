package graft

import org.apache.spark.sql.catalyst.expressions.ArrayTransform
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._

import graft.plans.FenceExpr

/** FenceExpr: a nondeterministic-marked passthrough that stops
  * CollapseProject / PushDownPredicates from duplicating an expensive
  * per-row expression across a Filter boundary (the r10 gap-tail
  * audit's q25 finding: 2× the entire map-stage CPU). */
class FenceSpec extends SparkSpec {

  private def kernelCount(plan: LogicalPlan): Int =
    plan.collect { case n => n }
      .flatMap(_.expressions)
      .map(e => e.collect { case t: ArrayTransform => t }.size)
      .sum

  test("fence is a value passthrough (codegen and interpreted agree)") {
    val base = spark.range(0, 200).select(col("id"),
      transform(split(md5(col("id").cast("string")), ""),
        c => upper(c)).as("k0"),
      FenceExpr.fence(transform(split(md5(col("id").cast("string")), ""),
        c => upper(c))).as("k1"))
    assert(base.filter(not(col("k0") === col("k1"))).count() == 0,
      "fenced value must be bit-identical to the unfenced expression")
  }

  test("unfenced control: pushdown duplicates the kernel (hazard exists)") {
    val expensive = transform(split(md5(col("id").cast("string")), ""),
      c => upper(c))
    val un = spark.range(0, 200).select(col("id"), expensive.as("k"))
      .filter(size(col("k")) > 0)
      .select(col("id"), size(col("k")).as("n"))
    // alias substitution re-expands the ArrayTransform into the filter
    // (and collapses the projections), so it appears 2+ times
    assert(kernelCount(un.queryExecution.optimizedPlan) >= 2,
      "control failed: Catalyst no longer duplicates — fence may be " +
        "obsolete, re-measure before removing it:\n" +
        un.queryExecution.optimizedPlan)
  }

  test("fenced: the kernel survives as ONE expression below the filter") {
    val expensive = transform(split(md5(col("id").cast("string")), ""),
      c => upper(c))
    val fe = spark.range(0, 200)
      .select(col("id"), FenceExpr.fence(expensive).as("k"))
      .filter(size(col("k")) > 0)
      .select(col("id"), size(col("k")).as("n"))
    assert(kernelCount(fe.queryExecution.optimizedPlan) == 1,
      s"fence bypassed:\n${fe.queryExecution.optimizedPlan}")
    assert(fe.count() == 200)
  }

  test("q25 evaluates the fingerprint kernel exactly once") {
    val plan = Queries.all("q25_fingerprint")(spark, sf())
      .queryExecution.optimizedPlan
    // ONE kernel instance = exactly 2 ArrayTransforms (charShingles'
    // substring transform + the md5 hashing transform); a re-expanded
    // plan doubles that
    assert(kernelCount(plan) == 2,
      s"q25's shingle+md5 kernel must appear once, not per-consumer:\n$plan")
  }

  test("column pruning is unaffected below the fence") {
    // the fenced kernel reads only `text`; doc_id/source/lang columns
    // must still be pruned from the scan
    val df = Tables.documents(spark, sf())
      .select(FenceExpr.fence(length(col("text"))).as("n"))
      .filter(col("n") > 0)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") &&
      scan.split("ReadSchema")(1).contains("text") &&
      !scan.split("ReadSchema")(1).split("\n")(0).contains("lang"),
      s"scan schema not pruned to text:\n$scan")
  }
}

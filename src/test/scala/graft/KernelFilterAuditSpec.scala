package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}

/** Repo-wide regression pin for SCALE.md lesson #6: no registered
  * query's optimized plan may carry a higher-order function or a
  * split() inside a FILTER condition — that is the signature of
  * PushDownPredicates / InferFiltersFromConstraints re-expanding an
  * expensive aliased kernel into the predicate, a silent 2× of the
  * map stage (the r10 q25/q231/q202/q54 findings, all fixed with
  * FenceExpr). Join conditions are checked too, with the two
  * by-design exceptions where the per-pair cosine confirm IS the
  * operator's work.
  *
  * Runtime note: building each plan at sf0.001 executes the eager
  * kernels (localCheckpoints, k-bounded collects) — this suite is a
  * mini end-to-end pass by design; keep it last-resort slow but
  * standing. */
class KernelFilterAuditSpec extends SparkSpec {

  private def kernels(e: Expression): Seq[String] =
    e.collect {
      case h: HigherOrderFunction => h.prettyName
      case _: StringSplit => "split"
    }

  // the per-pair double-prefilter + exact decimal confirm evaluated in
  // the near-dup JOIN conditions — the operator's actual work,
  // evaluated once per candidate pair by design
  private val JoinConditionKernelsAllowed = Set(
    "q34_cosine_neardup", "q100_embedding_contamination")

  test("no query carries a kernel inside a Filter condition") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf()).queryExecution.optimizedPlan
      val filterHits = plan.collect {
        case f: Filter => kernels(f.condition)
      }.flatten
      if (filterHits.nonEmpty)
        offenders += s"$name Filter[${filterHits.mkString(",")}]"
      val joinHits = plan.collect {
        case j: Join => j.condition.toSeq.flatMap(kernels)
      }.flatten
      if (joinHits.nonEmpty && !JoinConditionKernelsAllowed(name))
        offenders += s"$name Join[${joinHits.mkString(",")}]"
    }
    assert(offenders.isEmpty,
      "kernel-bearing predicates (fence the alias — SCALE.md lesson " +
        s"#6):\n${offenders.mkString("\n")}")
  }
}

package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Window => LWindow}

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

  // built once, shared by both audits — each plan build executes the
  // query's eager kernels, so paying it twice would double suite time
  private lazy val allPlans: Seq[(String, LogicalPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf()).queryExecution.optimizedPlan
    }

  test("no query carries a kernel inside a Filter condition") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, plan) <- allPlans) {
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

  // queries allowed an UNPARTITIONED window in their final optimized
  // plan — each audited bounded by construction, and the test ALSO
  // demands structural evidence under the window: a grouped aggregate
  // (census: q42's label census, q174's ≤64 bit-length buckets), a
  // Limit (top-N rank: q122/q157/q158's Fusion.rankOf over bm25's
  // .limit(topK)), or a checkpointed census (q192's |sources|-row
  // frame, q94's mixture stats). Any query OUTSIDE this set with an
  // unpartitioned window is the q124-class scale killer: a
  // corpus-proportional single-task sort.
  private val BoundedCensusWindowAllowed = Set(
    "q42_label_balance", "q94_domain_mixture", "q122_rrf_fusion",
    "q157_retrieval_eval", "q158_cascade_rerank", "q174_zipf_census",
    "q192_quota_allocation")

  test("no query runs an unpartitioned window outside the bounded-census whitelist") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit}
    import org.apache.spark.sql.execution.LogicalRDD
    def bounded(p: LogicalPlan): Boolean = p.collectFirst {
      case a: Aggregate if a.groupingExpressions.nonEmpty => a
      case l: GlobalLimit => l
      case l: LocalLimit => l
      case r: LogicalRDD => r
    }.isDefined
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, plan) <- allPlans) {
      val unpart = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      if (unpart.nonEmpty) {
        if (!BoundedCensusWindowAllowed(name))
          offenders += s"$name: ${unpart.size} unpartitioned window(s)"
        else for (w <- unpart)
          assert(bounded(w.child),
            s"$name: whitelisted window lacks bounded-input evidence " +
              s"(no census aggregate, limit, or checkpoint below):\n$w")
      }
    }
    assert(offenders.isEmpty,
      "unpartitioned windows outside the whitelist (single-task sort " +
        s"at scale — ride a two-phase kernel or checkpoint the " +
        s"census):\n${offenders.mkString("\n")}")
  }
}

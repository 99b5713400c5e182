package graft

import graft.operators.Validate
import graft.operators.Validate._

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (Some(1L), Some("view"), Some(5.0), Some("{a}")),
    (Some(2L), Some("error"), Some(150.0), Some("nope")),
    (None, Some("click"), None, None),
    (Some(1L), None, Some(-1.0), Some("{b}")))
    .toDF("id", "et", "v", "p")

  private def run(checks: Seq[Check]): Map[String, (Long, Long)] =
    Validate.audit(sample, checks)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("row-local checks count violations in one pass; nulls only fail not_null") {
    val got = run(Seq(
      NotNull("id"), NotNull("et"),
      InSet("et", Seq("view", "click")),
      InRange("v", 0.0, 100.0),
      Matches("p", "^\\{")))
    assert(got == Map(
      "not_null(id)" -> (1L, 4L),
      "not_null(et)" -> (1L, 4L),
      "in_set(et)" -> (1L, 4L), // 'error' only; the null et passes
      "in_range(v)" -> (2L, 4L), // 150 and -1; the null v passes
      "matches(p)" -> (1L, 4L))) // "nope"; the null p passes
  }

  test("unique counts surplus rows per duplicate key, nulls grouping as values") {
    val got = run(Seq(Unique(Seq("id")), Unique(Seq("id", "et"))))
    // ids: 1,2,null,1 -> 3 distinct -> 1 violation
    assert(got("unique(id)") == (1L, 4L))
    // (id, et) combos all distinct -> 0
    assert(got("unique(id,et)") == (0L, 4L))
  }

  test("referential integrity counts orphan keys; nulls pass; unions with audit") {
    val facts = Seq(Some(1L), Some(2L), Some(9L), None).toDF("k")
    val dim = Seq(1L, 2L, 3L, 3L).toDF("dk") // duplicate key must not multiply
    val report = Validate.audit(facts, Seq(NotNull("k")))
      .union(Validate.refIntegrity(facts, "k", dim, "dk"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(report("ref_integrity(k)") == (1L, 4L)) // only 9 is an orphan
    assert(report("not_null(k)") == (1L, 4L))
  }

  test("referential integrity on the star schema: orders -> customer is clean") {
    val orders = Tables.orders(spark, sf())
    val customer = Tables.customer(spark, sf())
    val row = Validate.refIntegrity(orders, "o_custkey", customer, "c_custkey")
      .collect().head
    assert(row.getLong(1) == 0L, "every order must reference a customer")
    assert(row.getLong(2) == orders.count())
  }

  test("the one-scan claim holds: row-local audit reads the table once") {
    val audit = Validate.audit(Tables.events(spark, sf()), Seq(
      NotNull("user_id"), InSet("event_type", Seq("view")),
      InRange("value", 0.0, 1.0)))
    val p = audit.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).length == 1, s"expected one scan:\n$p")
    assert(!p.contains("Expand"), s"no Expand allowed:\n$p")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.plans.CdcCutsExpr

class CdcCutsExprSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: recompute the degree-7 polynomial of every
    * trailing window from scratch with BigInt (the oracle's exact
    * HUGEINT shape), then mod/mix — no rolling state, so a bug in the
    * Rabin update can't hide in both sides. */
  private def refCuts(text: String): Seq[Long] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    (CdcCutsExpr.Window to n - 1).filter { i =>
      val poly = (0 until CdcCutsExpr.Window).map { k =>
        BigInt(cps(i - CdcCutsExpr.Window + k)) *
          BigInt(CdcCutsExpr.Base).pow(CdcCutsExpr.Window - 1 - k)
      }.sum
      val h = (poly mod BigInt(CdcCutsExpr.Mod)).toLong
      h * CdcCutsExpr.Mix % CdcCutsExpr.Mod < CdcCutsExpr.Thresh
    }.map(_.toLong)
  }

  private def exprCuts(text: String): Seq[Long] =
    Seq(text).toDF("t")
      .select(CdcCutsExpr.cdcCuts(col("t")).as("c"))
      .collect().head.getSeq[Long](0)

  test("rolling hash agrees with the from-scratch polynomial on random text") {
    val rnd = new scala.util.Random(7)
    for (len <- Seq(0, 1, 7, 8, 9, 64, 1000, 5000)) {
      val t = (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      assert(exprCuts(t) == refCuts(t), s"len=$len")
    }
  }

  test("code-point positions, not UTF-16 units: astral chars count once") {
    // 𝕏 (U+1D54F) is 2 UTF-16 units but one code point; positions and
    // window contents must follow DuckDB's substr/unicode semantics
    val rnd = new scala.util.Random(11)
    val t = (1 to 400).map(_ =>
      if (rnd.nextInt(5) == 0) "𝕏"
      else ('a' + rnd.nextInt(26)).toChar.toString).mkString
    assert(exprCuts(t) == refCuts(t))
  }

  test("insertion shifts boundaries only locally — trailing chunks realign") {
    val rnd = new scala.util.Random(13)
    val base = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = base.substring(0, 100) + "X" + base.substring(100)
    def chunks(t: String): Seq[String] = {
      val cuts = refCuts(t)
      val starts = 0L +: cuts
      val ends = cuts :+ t.length.toLong
      starts.zip(ends).map { case (s, e) =>
        t.substring(s.toInt, e.toInt) }
    }
    val a = chunks(base).toSet
    val b = chunks(edited).toSet
    // everything after the hash window re-synchronizes: the two chunk
    // sets share all but the few chunks spanning the edit site
    val shared = a.intersect(b).map(_.length).sum
    val total = a.map(_.length).sum
    assert(shared * 10 >= total * 9,
      s"expected >=90% content realigned, got $shared/$total")
    // while fixed-width chunking loses every block after the insert
    def fixed(t: String): Set[String] = t.grouped(64).toSet
    val fShared = fixed(base).intersect(fixed(edited)).map(_.length).sum
    assert(fShared * 10 < total * 9,
      s"fixed-width should NOT realign, got $fShared/$total")
  }

  test("null propagates; empty and short strings cut nowhere") {
    val df = Seq[Option[String]](None, Some(""), Some("abcdefg"), Some("abcdefgh"))
      .toDF("t").select(CdcCutsExpr.cdcCuts(col("t")).as("c"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).getSeq[Long](0).isEmpty)
    // len==8: position 8 is the final position (pos < n fails) — no cut
    assert(rows(3).getSeq[Long](0).isEmpty)
  }

  test("SQL registration works") {
    CdcCutsExpr.register(spark)
    val r = spark.sql("SELECT size(cdc_cuts('abcdefghij')) AS n")
      .collect().head
    assert(r.getInt(0) >= 0)
  }

  test("stays inside WholeStageCodegen (no CodegenFallback)") {
    val df = Seq("abcdefghijklmnop").toDF("t")
      .select(CdcCutsExpr.cdcCuts(col("t")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Builds a SEPARATE session with withExtensions (can't reuse the shared
  * one — extensions bind at session construction). */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions injects strategy + ip_to_int SQL function") {
    // getOrCreate() returns any active session (ignoring extensions), so
    // clear active/default first; the SparkContext is shared with the
    // other suites, so do NOT stop() it — just restore the sessions.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      import spark.implicits._
      assert(spark.sql("SELECT ip_to_int('1.2.3.4') AS v")
        .collect().head.getLong(0) == 16909060L)
      assert(spark.sql("SELECT nfc_normalize('cafe\u0301') AS v")
        .collect().head.getString(0) == "caf\u00e9")
      // strategy available without runtime registration
      val probes = Seq(5L, 150L).toDF("k")
      val dim = Seq((0L, 99L, "a")).toDF("lo", "hi", "tag")
      val out = graft.plans.RangeLookup.join(probes, dim, "k", "lo", "hi")
      assert(out.count() == 2)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

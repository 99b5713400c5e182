package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.EventAnalytics
import graft.streaming.RollupMaintenance

/** Incremental hourly rollup: merged per-batch deltas == from-scratch
  * aggregation for any batch slicing, idempotent replay, and the
  * monitoring readouts (anomaly/forecast) agree batch vs rollup.
  */
class RollupMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  // 24 calm hours at n=2 then a 3-event spike hour (the forecast
  // fixture), split across two files so the stream sees two batches
  private val calm = (0L until 24L).flatMap(h =>
    Seq.tabulate(2)(i => ("click", h * 3600000L + i)))
  private val spike = Seq.tabulate(3)(i => ("click", 24L * 3600000L + i))

  private def writeCsv(dir: java.nio.file.Path, name: String,
                       rows: Seq[(String, Long)]): Unit =
    Files.write(dir.resolve(name),
      rows.map { case (t, ms) => s"$t,$ms" }.mkString("\n")
        .getBytes(StandardCharsets.UTF_8))

  private def maintain(in: java.nio.file.Path, out: String,
                       ckpt: String): Unit = {
    val q = RollupMaintenance.run(
      spark.readStream.schema("event_type STRING, ms LONG")
        .csv(in.toString),
      out, ckpt,
      w => w.trigger(Trigger.AvailableNow()))
    q.awaitTermination()
  }

  test("merged deltas == from-scratch hourly rollup across batch slicings") {
    val d = Files.createTempDirectory("graft-rollup")
    val in = d.resolve("in"); Files.createDirectories(in)
    writeCsv(in, "b1.csv", calm)
    maintain(in, d.resolve("out").toString, d.resolve("ckpt").toString)
    writeCsv(in, "b2.csv", spike)
    maintain(in, d.resolve("out").toString, d.resolve("ckpt").toString)

    val merged = RollupMaintenance
      .mergedHourly(spark, d.resolve("out").toString)
      .as[(String, Long, Long)].collect().toSet
    val batch = EventAnalytics.hourlyCounts(
      (calm ++ spike).toDF("event_type", "ms"))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == batch)
  }

  test("monitoring readouts agree: events-side == rollup-side") {
    val d = Files.createTempDirectory("graft-rollup2")
    val in = d.resolve("in"); Files.createDirectories(in)
    writeCsv(in, "b1.csv", calm ++ spike)
    maintain(in, d.resolve("out").toString, d.resolve("ckpt").toString)
    val rollup = RollupMaintenance
      .mergedHourly(spark, d.resolve("out").toString)
    val ev = (calm ++ spike).toDF("event_type", "ms")

    assert(EventAnalytics.rateAnomaliesFromHourly(rollup)
      .collect().toSeq ==
      EventAnalytics.rateAnomalies(ev).collect().toSeq)
    assert(EventAnalytics.forecastBacktestFromHourly(rollup)
      .collect().toSeq ==
      EventAnalytics.forecastBacktest(ev).collect().toSeq)
  }

  test("a replayed batch overwrites its own delta — no double count") {
    val d = Files.createTempDirectory("graft-rollup3")
    val in = d.resolve("in"); Files.createDirectories(in)
    writeCsv(in, "b1.csv", calm)
    maintain(in, d.resolve("out").toString, d.resolve("ckpt").toString)
    // simulate the replay: re-run batch 0's foreachBatch body directly
    EventAnalytics.hourlyCounts(calm.toDF("event_type", "ms"))
      .coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("out").toString + "/batch=0")
    val merged = RollupMaintenance
      .mergedHourly(spark, d.resolve("out").toString)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(merged == calm.size.toLong)
  }
}

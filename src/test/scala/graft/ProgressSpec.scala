package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.streaming.{LogStream, Progress}

class ProgressSpec extends SparkSpec {

  test("recorder observes per-batch rows for a streaming run") {
    val d = Files.createTempDirectory("graft-progress")
    val logDir = d.resolve("logs"); Files.createDirectories(logDir)
    Files.write(logDir.resolve("m.log"),
      ("Aug  1 10:00:00 mx p[1]: unknown[10.0.0.1]: SASL x failed, sasl_username=a\n" +
        "Aug  1 10:00:01 mx p[1]: unknown[10.0.0.2]: SASL x failed, sasl_username=b\n")
        .getBytes(StandardCharsets.UTF_8))
    val rec = Progress.attach(spark)
    try {
      LogStream.runToCompletion(LogStream.toCsv(
        LogStream.events(spark, logDir.toString + "/*", 2025),
        d.resolve("out").toString, d.resolve("ckpt").toString))
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (rec.totalRows < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(rec.totalRows == 2, rec.batches.toString)
      assert(rec.batches.forall(_.durationMs >= 0))
      val line = Progress.summaryLine(rec)
      assert(line.contains("rows=2"), line)
      assert(line.matches(
        "Streaming run completed: batches=\\d+ rows=2 sources=\\d+ duration_ms=\\d+"),
        line)
    } finally Progress.detach(spark, rec)
  }

  test("batch run summary reports files, rows, offset, duration") {
    val d = Files.createTempDirectory("graft-runsum")
    val log = d.resolve("mail.log")
    val content =
      "Aug  1 10:00:00 mx p[1]: unknown[10.0.0.1]: SASL x failed, sasl_username=a\n" +
        "Aug  1 10:00:01 mx p[1]: unknown[10.0.0.2]: SASL x failed, sasl_username=b\n"
    Files.write(log, content.getBytes(StandardCharsets.UTF_8))
    val s = Pipeline.runIncrementalSummarized(spark, log,
      d.resolve("state.offset"), d.resolve("out.csv").toString, 2025)
    assert(s.rows == 2)
    assert(s.newOffset == content.getBytes(StandardCharsets.UTF_8).length)
    assert(s.durationMs >= 0)
    assert(s.line ==
      s"Extraction completed: file=$log rows=2 " +
        s"new offset: ${s.newOffset} duration_ms=${s.durationMs}")
    // second run: nothing new => rows 0, offset unchanged
    val s2 = Pipeline.runIncrementalSummarized(spark, log,
      d.resolve("state.offset"), d.resolve("out.csv").toString, 2025)
    assert(s2.rows == 0 && s2.newOffset == s.newOffset)
  }
}

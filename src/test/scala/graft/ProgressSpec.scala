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
    } finally Progress.detach(spark, rec)
  }
}

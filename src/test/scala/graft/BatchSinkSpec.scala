package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.sources.SqlExport
import graft.streaming.BatchSink

class BatchSinkSpec extends SparkSpec {

  test("foreachBatch writes one atomic sql file per micro-batch") {
    val d = Files.createTempDirectory("graft-bsink")
    val in = d.resolve("in"); Files.createDirectories(in)
    val out = d.resolve("out")
    val specs = Seq(
      SqlExport.ColumnSpec("user", "username", SqlExport.StrKind, notNull = true),
      SqlExport.ColumnSpec("n", "n_int", SqlExport.IntKind, notNull = false))

    def run(file: String, rows: Seq[String]): Unit = {
      Files.write(in.resolve(file),
        rows.mkString("\n").getBytes(StandardCharsets.UTF_8))
      val stream = spark.readStream.schema("user STRING, n STRING")
        .option("delimiter", ",").csv(in.toString)
      val q = BatchSink.sqlFiles(stream, out, "events", specs,
        d.resolve("ckpt").toString).start()
      q.awaitTermination()
    }

    run("a.csv", Seq("alice,1", "bob,2"))
    run("b.csv", Seq("carol,3"))
    val files = Files.list(out).iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".sql")).toSeq.sorted
    assert(files.size == 2, files)
    val first = Files.readString(out.resolve(files.head))
    assert(first.startsWith("BEGIN TRANSACTION;"))
    assert(first.trim.endsWith("COMMIT;"))
    assert(first.contains("'alice', 1"))

    // violating batch -> .rejected marker, no partial .sql
    run("c.csv", Seq("N/A,9"))
    val names = Files.list(out).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.count(_.endsWith(".rejected")) == 1)
    assert(names.count(_.endsWith(".sql")) == 2)
    assert(!names.exists(_.endsWith(".tmp")))
  }
}

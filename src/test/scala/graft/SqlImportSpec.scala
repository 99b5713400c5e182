package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SqlImport

class SqlImportSpec extends AnyFunSuite {

  private val fastRetry = SqlImport.RetryPolicy(
    maxAttempts = 3, initialDelayMs = 1, maxDelayMs = 4)

  test("pending = on-disk minus imported-log; ordered; log advances") {
    val d = Files.createTempDirectory("graft-import")
    def put(n: String, s: String) =
      Files.write(d.resolve(n), s.getBytes(StandardCharsets.UTF_8))
    put("b2.sql", "INSERT INTO t VALUES (2);")
    put("a1.sql", "INSERT INTO t VALUES (1);")
    put("notes.txt", "ignored")
    val log = d.resolve("state/imported.log")
    val executed = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val Right(r1) = SqlImport.run(d, log, stmts => executed += stmts,
      fastRetry): @unchecked
    assert(r1.imported == Seq("a1.sql", "b2.sql")) // lexicographic
    assert(executed.map(_.head) ==
      Seq("INSERT INTO t VALUES (1);", "INSERT INTO t VALUES (2);"))
    // second run: everything skipped, nothing re-executed
    val Right(r2) = SqlImport.run(d, log, stmts => executed += stmts,
      fastRetry): @unchecked
    assert(r2.imported.isEmpty && r2.skipped == Seq("a1.sql", "b2.sql"))
    assert(executed.size == 2)
    // new file after the fact: only it runs
    put("c3.sql", "INSERT INTO t VALUES (3);")
    val Right(r3) = SqlImport.run(d, log, stmts => executed += stmts,
      fastRetry): @unchecked
    assert(r3.imported == Seq("c3.sql") && executed.size == 3)
  }

  test("retry with backoff recovers from transient failures") {
    val d = Files.createTempDirectory("graft-import2")
    Files.write(d.resolve("x.sql"), "S;".getBytes(StandardCharsets.UTF_8))
    var calls = 0
    val flaky: SqlImport.Executor = _ => {
      calls += 1
      if (calls < 3) throw new RuntimeException("db locked")
    }
    val Right(r) = SqlImport.run(d, d.resolve("log"), flaky,
      fastRetry): @unchecked
    assert(r.imported == Seq("x.sql"))
    assert(calls == 3)
  }

  test("persistent failure -> failed list, not in log, retried next run") {
    val d = Files.createTempDirectory("graft-import3")
    Files.write(d.resolve("x.sql"), "S;".getBytes(StandardCharsets.UTF_8))
    val Right(r) = SqlImport.run(d, d.resolve("log"),
      _ => throw new RuntimeException("always down"), fastRetry): @unchecked
    assert(r.failed == Seq("x.sql") && r.imported.isEmpty)
    var ok = 0
    val Right(r2) = SqlImport.run(d, d.resolve("log"),
      _ => ok += 1, fastRetry): @unchecked
    assert(r2.imported == Seq("x.sql") && ok == 1)
  }

  test("lock excludes a concurrent importer") {
    val d = Files.createTempDirectory("graft-import4")
    Files.write(d.resolve("x.sql"), "S;".getBytes(StandardCharsets.UTF_8))
    val inFirst = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      SqlImport.run(d, d.resolve("log"), _ => {
        inFirst.countDown(); release.await()
      }, fastRetry)
      ()
    })
    t.start()
    inFirst.await()
    // NB: same-JVM overlapping FileChannel locks throw; treat as busy too
    val second =
      try SqlImport.run(d, d.resolve("log2"), _ => (), fastRetry)
      catch { case _: java.nio.channels.OverlappingFileLockException =>
        Left("another importer holds the lock") }
    assert(second.isLeft)
    release.countDown()
    t.join()
  }
}

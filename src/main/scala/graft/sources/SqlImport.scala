package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** The import side of the SQL-file handshake
  * (`/root/reference/lib/maillogsentinel/sql_importer.py:280-522`):
  *
  *  - single-importer **file lock** (flock analog, :51-119) via
  *    java.nio FileLock — a second importer backs off immediately;
  *  - **connect retry** with exponential backoff (:34-37, :390-417 —
  *    5 tries, 1 s initial, 60 s cap);
  *  - **idempotence** by imported-files log (:251-277, :425-441): the
  *    pending set is `*.sql on disk` minus `names in the log` — the
  *    anti join the Spark engine expresses as `left_anti` (q07 shape);
  *    done here driver-side because the file census is tiny;
  *  - per-file **transactional apply**: all statements of a file hand
  *    to the executor as one unit; only success appends to the log
  *    (a crashed import replays the file — at-least-once into a
  *    transactional target = effectively exactly-once).
  *
  * The statement executor is injectable; [[jdbcExecutor]] is the real
  * one (any `java.sql` driver — the reference talks to SQLite via
  * `jdbc:sqlite:…`; SqlImportJdbcSpec proves the whole
  * lock/retry/transaction/anti-dedup path against embedded Derby, the
  * JDBC engine this container actually ships).
  */
object SqlImport {

  /** Executes one file's statements atomically; throw to signal retry/
    * failure. */
  type Executor = Seq[String] => Unit

  final case class RetryPolicy(maxAttempts: Int = 5, initialDelayMs: Long = 1000,
                               maxDelayMs: Long = 60000)

  final case class ImportReport(imported: Seq[String], skipped: Seq[String],
                                failed: Seq[String])

  /** flock-style advisory lock; Left if another importer holds it
    * (LOCK_NB parity — no blocking wait). */
  def withLock[A](lockFile: Path)(body: => A): Either[String, A] = {
    Files.createDirectories(lockFile.getParent)
    val ch = java.nio.channels.FileChannel.open(lockFile,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock = ch.tryLock()
      if (lock == null) Left("another importer holds the lock")
      else try Right(body) finally lock.release()
    } finally ch.close()
  }

  def retrying[A](policy: RetryPolicy)(body: => A): A = {
    var attempt = 0
    var delay = policy.initialDelayMs
    while (true) {
      attempt += 1
      try return body
      catch {
        case e: Exception if attempt < policy.maxAttempts =>
          Thread.sleep(delay)
          delay = math.min(delay * 2, policy.maxDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Real JDBC executor (the sql_importer.py:122-146 role): applies one
    * file's statements as a SINGLE transaction via `java.sql`. Trailing
    * `;` separators and inline transaction-control lines
    * (`BEGIN TRANSACTION` / `COMMIT`, which [[SqlExport]] emits for
    * script compatibility) are normalized away because the executor
    * itself owns the transaction boundary — autoCommit off, commit on
    * success, rollback on ANY failure: the all-or-nothing batch the
    * reference gets from sqlite3's script transaction. Driver-agnostic
    * (plain DriverManager): the reference targets `jdbc:sqlite:…`; no
    * sqlite-jdbc jar exists in this container's offline caches (checked
    * ~/.ivy2, coursier, /opt/spark/jars), so SqlImportJdbcSpec proves
    * the path end-to-end against embedded Derby — the real JDBC engine
    * Spark ships — and the sqlite URL remains the one untestable hop. */
  def jdbcExecutor(url: String): Executor = stmts => {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        stmts.iterator
          .map(_.trim.stripSuffix(";").trim)
          .filter(s => s.nonEmpty &&
            !s.equalsIgnoreCase("BEGIN TRANSACTION") &&
            !s.equalsIgnoreCase("COMMIT"))
          .foreach(st.execute)
        conn.commit()
      } catch { case e: Throwable => conn.rollback(); throw e }
      finally st.close()
    } finally conn.close()
  }

  private def readLog(log: Path): Set[String] =
    if (Files.exists(log))
      Files.readAllLines(log, StandardCharsets.UTF_8).asScala.toSet
    else Set.empty

  private def markImported(log: Path, name: String): Unit = {
    Files.createDirectories(log.getParent)
    Files.write(log, (name + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Apply all pending .sql files under `dir`, lexicographic order
    * (sql_importer.py:435-441). */
  def run(dir: Path, importedLog: Path, executor: Executor,
          policy: RetryPolicy = RetryPolicy()): Either[String, ImportReport] =
    withLock(dir.resolve(".import.lock")) {
      val done = readLog(importedLog)
      val all = Files.list(dir).iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".sql"))
        .map(_.getFileName.toString).toSeq.sorted
      val (skipped, pending) = all.partition(done.contains)
      val imported = scala.collection.mutable.ArrayBuffer.empty[String]
      val failed = scala.collection.mutable.ArrayBuffer.empty[String]
      pending.foreach { name =>
        val stmts = Files.readAllLines(dir.resolve(name), StandardCharsets.UTF_8)
          .asScala.map(_.trim).filter(_.nonEmpty).toSeq
        try {
          retrying(policy)(executor(stmts))
          markImported(importedLog, name)
          imported += name
        } catch { case scala.util.control.NonFatal(_) => failed += name }
      }
      ImportReport(imported.toSeq, skipped, failed.toSeq)
    }
}

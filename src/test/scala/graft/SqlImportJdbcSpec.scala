package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.sources.{SqlExport, SqlImport}

/** End-to-end JDBC proof of the import path against embedded Derby
  * (the real `java.sql` engine shipped with Spark): transaction
  * atomicity (rollback leaves zero rows), export→import round trip
  * with value parity, and idempotence of the imported-files log — the
  * last-hop behaviors the injectable-executor specs could only record.
  * The reference's `jdbc:sqlite:` URL stays the one untestable hop (no
  * sqlite-jdbc jar in this container's offline caches).
  */
class SqlImportJdbcSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby-test.log")

  private var n = 0
  private def freshDb(): String = {
    n += 1; s"jdbc:derby:memory:graftimp$n;create=true"
  }

  private def writeSql(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

  private def queryLongs(url: String, sql: String): Seq[Seq[Any]] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val width = rs.getMetaData.getColumnCount
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (rs.next()) out += (1 to width).map(rs.getObject(_))
      out.toSeq
    } finally conn.close()
  }

  test("export → file → JDBC import round-trips values through Derby") {
    val url = freshDb()
    val dir = Files.createTempDirectory("sqljdbc")
    // Derby-dialect DDL applied through the same executor path
    writeSql(dir, "000_schema.sql", Seq(
      "CREATE TABLE sales (sale_id BIGINT, server VARCHAR(200), qty BIGINT, flagged INTEGER);"))
    val df = Seq(
      ("1", "alpha's host", "10", "true"),
      ("2", "beta", "NA", "no"),
      ("3", "gamma", "7", "yes")).toDF("id", "srv", "q", "fl")
    val specs = Seq(
      SqlExport.ColumnSpec("id", "sale_id", SqlExport.IntKind, notNull = true),
      SqlExport.ColumnSpec("srv", "server", SqlExport.StrKind, notNull = true),
      SqlExport.ColumnSpec("q", "qty", SqlExport.IntKind, notNull = false),
      SqlExport.ColumnSpec("fl", "flagged", SqlExport.BoolKind, notNull = false))
    val Right(lines) = SqlExport.export(df, "sales", specs)
    writeSql(dir, "001_rows.sql", lines.collect().toSeq)

    val report = SqlImport.run(dir, dir.resolve("imported.log"),
      SqlImport.jdbcExecutor(url)).toOption.get
    assert(report.imported == Seq("000_schema.sql", "001_rows.sql"))
    assert(report.failed.isEmpty)

    val rows = queryLongs(url,
      "SELECT sale_id, server, qty, flagged FROM sales ORDER BY sale_id")
    assert(rows.map(_.map(String.valueOf)) == Seq(
      Seq("1", "alpha's host", "10", "1"), // quote-escape round-trips
      Seq("2", "beta", "null", "0"),       // NA → SQL NULL
      Seq("3", "gamma", "7", "1")))
  }

  test("a failing statement rolls back the whole file's transaction") {
    val url = freshDb()
    val dir = Files.createTempDirectory("sqljdbc")
    writeSql(dir, "000_schema.sql",
      Seq("CREATE TABLE t (a BIGINT NOT NULL);"))
    // two good inserts, then a NOT NULL violation: Derby must keep NONE
    writeSql(dir, "001_bad.sql", Seq(
      "INSERT INTO t (a) VALUES (1);",
      "INSERT INTO t (a) VALUES (2);",
      "INSERT INTO t (a) VALUES (NULL);"))
    val fast = SqlImport.RetryPolicy(maxAttempts = 2, initialDelayMs = 1)
    val report = SqlImport.run(dir, dir.resolve("imported.log"),
      SqlImport.jdbcExecutor(url), fast).toOption.get
    assert(report.imported == Seq("000_schema.sql"))
    assert(report.failed == Seq("001_bad.sql"))
    assert(queryLongs(url, "SELECT COUNT(*) FROM t").head.head
      .toString == "0", "partial rows must roll back")
  }

  test("re-run skips already-imported files (anti-dedup log) and " +
    "imports a repaired file exactly once") {
    val url = freshDb()
    val dir = Files.createTempDirectory("sqljdbc")
    val log = dir.resolve("imported.log")
    writeSql(dir, "000_schema.sql",
      Seq("CREATE TABLE t (a BIGINT NOT NULL);"))
    writeSql(dir, "001_bad.sql", Seq("INSERT INTO t (a) VALUES (NULL);"))
    val fast = SqlImport.RetryPolicy(maxAttempts = 2, initialDelayMs = 1)
    val r1 = SqlImport.run(dir, log, SqlImport.jdbcExecutor(url), fast)
      .toOption.get
    assert(r1.imported == Seq("000_schema.sql") &&
      r1.failed == Seq("001_bad.sql"))
    // repair the file; second run must skip the schema (logged) and
    // apply only the repaired file — DDL replay would throw in Derby,
    // so a green second run IS the idempotence proof
    writeSql(dir, "001_bad.sql", Seq("INSERT INTO t (a) VALUES (42);"))
    val r2 = SqlImport.run(dir, log, SqlImport.jdbcExecutor(url), fast)
      .toOption.get
    assert(r2.skipped == Seq("000_schema.sql"))
    assert(r2.imported == Seq("001_bad.sql") && r2.failed.isEmpty)
    assert(queryLongs(url, "SELECT a FROM t").map(_.head.toString) ==
      Seq("42"))
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** The canonical events table as semicolon-delimited CSV — source + sink
  * (`/root/reference/lib/maillogsentinel/parser.py:95-121` write,
  * `report.py:118-150` read).
  *
  * Schema is declared, never inferred (the reference hard-codes its
  * header; SURVEY §1.4). Short/malformed rows are dropped
  * (report.py:133-138 ⇒ DROPMALFORMED).
  *
  * Sink parity note (SURVEY §7.4.4): the reference appends to ONE file
  * with a header written once; Spark writes a directory of part files per
  * batch. The directory IS the table here (scales to 100 TB); a
  * single-file compat export is [[writeCompatSingleFile]].
  */
object EventsCsv {

  /** parser.py:109-121's 9-column header, as a typed StructType. */
  val schema: StructType = StructType(Seq(
    StructField("server", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("ip", StringType, nullable = false),
    StructField("user", StringType, nullable = false),
    StructField("hostname", StringType, nullable = true),
    StructField("reverse_dns_status", StringType, nullable = false),
    StructField("country_code", StringType, nullable = false),
    StructField("asn", StringType, nullable = false),
    StructField("aso", StringType, nullable = false)))

  def read(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    // Spark pads short rows with nulls rather than dropping them (token
    // count isn't checked under CSV column pruning), so the reference's
    // "<9 fields ⇒ skip row" rule (report.py:133-138) is enforced as an
    // explicit all-columns-present filter on top of DROPMALFORMED.
    spark.read
      .option("delimiter", ";")
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(schema)
      .csv(path)
      .filter(schema.fieldNames.map(col(_).isNotNull).reduce(_ && _))
  }

  def append(df: DataFrame, path: String): Unit =
    df.write
      .option("delimiter", ";")
      .option("header", "true")
      .mode(SaveMode.Append)
      .csv(path)

  /** Byte-parity artifact: one CSV file, header once. Collects through the
    * driver — compat/export only, not a scale path. */
  def writeCompatSingleFile(df: DataFrame, file: java.nio.file.Path): Unit = {
    val cols = schema.fieldNames
    val header = cols.mkString(";")
    val rows = df.selectExpr(cols: _*).collect().map(r =>
      cols.indices.map(i => Option(r.getString(i)).getOrElse(""))
        .mkString(";"))
    java.nio.file.Files.createDirectories(file.getParent)
    val existing = java.nio.file.Files.exists(file)
    val out = new java.io.PrintWriter(new java.io.FileWriter(file.toFile, true))
    try {
      if (!existing) out.println(header) // header iff absent (parser.py:96)
      rows.foreach(out.println)
    } finally out.close()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory (e.g. /root/testdata/sf0.01)
  * and read one parquet file per table. Schemas are fixed by the driver's
  * generator; we do not infer or coerce here — queries cast explicitly
  * where numeric determinism matters (see Queries.scala).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts has shipped as two different parquet types across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 only reads via
    * `nanosAsLong` ⇒ BIGINT) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (⇒ TIMESTAMP_NTZ). Branch on the *loaded* dataType so a testdata
    * regeneration can never break every events consumer again:
    *   - LongType            ⇒ nanos era: floor-truncate to µs with integer
    *                           division (bit-identical to DuckDB's ns→µs).
    *   - TimestampNTZType    ⇒ naive-UTC wall clock: cast to TIMESTAMP.
    *   - TimestampType       ⇒ pass through.
    * The NTZ→TIMESTAMP cast interprets the wall clock in the session time
    * zone, so we pin the session to UTC here — the whole query surface
    * (oracles included) was defined under UTC, and this makes any
    * caller-provided session (driver's entry() smoke check, bench)
    * deterministic. `nanosAsLong` is set unconditionally: it only affects
    * nanos-annotated columns, so it is a no-op for the µs generation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts drifted to unsupported type $other — update Tables.events")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

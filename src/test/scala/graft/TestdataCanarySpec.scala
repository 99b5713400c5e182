package graft

import org.apache.spark.sql.types._

/** Schema-drift canary for the driver-generated testdata.
  *
  * The driver regenerates /root/testdata between rounds, and parquet
  * physical types have drifted before (events.ts went TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS) between r3 and r4, erroring 30 queries at analysis
  * time with an opaque DATATYPE_MISMATCH). This spec asserts only the
  * *invariants the query surface actually needs* — not exact physical
  * types — so the next regeneration produces ONE readable failure naming
  * the drifted column instead of 30 opaque ones.
  */
class TestdataCanarySpec extends SparkSpec {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }
  private def isStringy(dt: DataType): Boolean = dt.isInstanceOf[StringType]
  private def isDateLike(dt: DataType): Boolean = dt match {
    case _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }
  /** ts must be timestamp-like, or a raw integral we know how to convert
    * (the nanos-as-long era). Anything else needs a Tables.events update. */
  private def isTsConvertible(dt: DataType): Boolean =
    isDateLike(dt) || dt.isInstanceOf[LongType]
  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(_: FloatType | _: DoubleType, _) => true
    case _ => false
  }

  private def check(table: String, col: String, pred: DataType => Boolean,
                    want: String): Unit = {
    val df = Tables.load(spark, sf(), table)
    val field = df.schema.fields.find(_.name == col)
    assert(field.isDefined,
      s"TESTDATA DRIFT: $table.$col is GONE — columns now: " +
        df.schema.fieldNames.mkString(", "))
    assert(pred(field.get.dataType),
      s"TESTDATA DRIFT: $table.$col is now ${field.get.dataType.simpleString}, " +
        s"queries need $want — update Tables.scala / the affected queries")
  }

  test("all ten tables load and are non-empty at sf0.001") {
    Tables.names.foreach { t =>
      val df = Tables.load(spark, sf(), t)
      assert(df.limit(1).count() == 1L, s"TESTDATA DRIFT: $t is empty or unreadable")
    }
  }

  test("events invariants (ts convertible, ids integral)") {
    check("events", "ts", isTsConvertible, "timestamp-like or raw nanos long")
    check("events", "user_id", isIntegral, "integral")
    check("events", "event_type", isStringy, "string")
    check("events", "value", isNumeric, "numeric")
    // and the adaptive loader must land on a plain TIMESTAMP whatever the
    // physical flavor — every downstream unix_millis/date_format needs it
    assert(Tables.events(spark, sf()).schema("ts").dataType == TimestampType,
      "Tables.events must normalize ts to TIMESTAMP")
  }

  test("tpch-ish invariants (join keys integral, dates date-like, amounts numeric)") {
    check("region", "r_regionkey", isIntegral, "integral")
    check("nation", "n_nationkey", isIntegral, "integral")
    check("nation", "n_regionkey", isIntegral, "integral")
    check("customer", "c_custkey", isIntegral, "integral")
    check("customer", "c_nationkey", isIntegral, "integral")
    check("supplier", "s_suppkey", isIntegral, "integral")
    check("part", "p_partkey", isIntegral, "integral")
    check("orders", "o_orderkey", isIntegral, "integral")
    check("orders", "o_custkey", isIntegral, "integral")
    check("orders", "o_orderdate", isDateLike, "date-like")
    check("orders", "o_totalprice", isNumeric, "numeric")
    check("lineitem", "l_orderkey", isIntegral, "integral")
    check("lineitem", "l_partkey", isIntegral, "integral")
    check("lineitem", "l_suppkey", isIntegral, "integral")
    check("lineitem", "l_quantity", isNumeric, "numeric")
    check("lineitem", "l_extendedprice", isNumeric, "numeric")
    check("lineitem", "l_shipdate", isDateLike, "date-like")
    check("lineitem", "l_returnflag", isStringy, "string")
  }

  test("documents/embeddings invariants (text string, embedding float array)") {
    check("documents", "doc_id", isIntegral, "integral")
    check("documents", "text", isStringy, "string")
    check("documents", "source", isStringy, "string")
    check("documents", "lang", isStringy, "string")
    check("embeddings", "vec_id", isIntegral, "integral")
    check("embeddings", "embedding", isFloatArray, "array<float|double>")
    check("embeddings", "label", isIntegral, "integral")
  }

  test("embedding geometry invariants (64 dims, dense ids from 0, >= 500 rows)") {
    // q126/q133 inline a 64x8 sign matrix, the k-means family seeds on
    // ids 0..k-1, q127 splits at id 400, q130 at id 50 — a regeneration
    // that changes dims, sparsifies ids, or shrinks the table must fail
    // HERE with one readable message, not in ten queries
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf())
    val row = e.agg(
      count(lit(1)), min(col("vec_id")), max(col("vec_id")),
      min(size(col("embedding"))), max(size(col("embedding"))),
      countDistinct(col("vec_id")))
      .collect()(0)
    val (n, lo, hi) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(row.getInt(3) == 64 && row.getInt(4) == 64,
      s"TESTDATA DRIFT: embedding dims now ${row.getInt(3)}..${row.getInt(4)}, " +
        "q126/q133's inline sign matrix and the dims-pinned oracles assume 64")
    // min/max/count alone would pass {0,0,2,…,n-1}; distinct==n is what
    // actually proves density (duplicate + gap is the sparse-seed trap)
    assert(lo == 0 && hi == n - 1 && row.getLong(5) == n,
      s"TESTDATA DRIFT: vec_id no longer dense 0..n-1 ($lo..$hi, " +
        s"${row.getLong(5)} distinct of $n rows) — k-means seeding (id < k) " +
        "and the id-split queries (q127/q130) assume density")
    assert(n >= 500,
      s"TESTDATA DRIFT: embeddings shrank to $n rows; q127 splits at id 400")
  }
}

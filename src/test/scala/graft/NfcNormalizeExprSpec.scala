package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.NfcNormalizeExpr

/** The native NFC normalization expression (q61's kernel). Codepoints are
  * spelled as escapes throughout — decomposed "cafe\u0301" (5 units) must
  * compose to "café" (4 units), and a source-file re-encoding must
  * not silently change what the test asserts. */
class NfcNormalizeExprSpec extends SparkSpec {
  import spark.implicits._

  private val deCafe = "cafe\u0301"   // e + combining acute
  private val nfcCafe = "caf\u00e9"   // precomposed
  private val deNaive = "nai\u0308ve" // i + combining diaeresis
  private val nfcNaive = "na\u00efve"

  test("ASCII fast path returns the input object unchanged") {
    val in = UTF8String.fromString("plain ascii text 123")
    assert(NfcNormalizeExpr.normalize(in) eq in)
  }

  test("already-NFC non-ASCII skips the rebuild") {
    val in = UTF8String.fromString(nfcCafe)
    assert(NfcNormalizeExpr.normalize(in) eq in)
  }

  test("decomposed sequences compose (e+U+0301 -> U+00E9, i+U+0308 -> U+00EF)") {
    val df = Seq(deCafe, deNaive, "ascii").toDF("t")
      .select(NfcNormalizeExpr.nfc(col("t")).as("n"))
    assert(df.as[String].collect().toSeq == Seq(nfcCafe, nfcNaive, "ascii"))
  }

  test("null propagates; SQL registration works") {
    NfcNormalizeExpr.register(spark)
    val r = spark.sql(
      s"SELECT nfc_normalize(CAST(NULL AS STRING)) AS a, " +
        s"nfc_normalize('$deCafe') AS b, length('$deCafe') AS lb")
      .collect().head
    assert(r.isNullAt(0) && r.getString(1) == nfcCafe && r.getInt(2) == 5)
  }

  test("stays inside WholeStageCodegen (no CodegenFallback)") {
    // spark.range keeps the projection non-foldable (a literal input
    // constant-folds into a LocalTableScan with no codegen stage)
    val df = spark.range(8)
      .select(NfcNormalizeExpr.nfc(concat(lit("t"), col("id").cast("string")))
        .as("n"))
    // the `*(n)` prefix is the WholeStageCodegen marker in the compact
    // plan string (the word itself only appears in explain("formatted"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [nfc_normalize"), plan)
    assert(df.collect().map(_.getString(0)).toSeq ==
      (0 until 8).map(i => s"t$i"))
  }
}

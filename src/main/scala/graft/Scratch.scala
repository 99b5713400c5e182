package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the driver contract).
  * Current use: r10 fence A/B — interleaved fenced vs unfenced for the
  * q54 (posexplode over asDouble) and q118 (Dsir grams) shapes. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMER $label%-22s $dt%8.2f s")
      dt
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(df.columns.map(col): _*).as("_h"))
        .agg(bit_xor(col("_h"))).collect()
      ()
    }
    import graft.operators.{Quantize, Similarity}
    import graft.plans.FenceExpr.fence

    // ---- q54 shape ----
    def q54of(v: org.apache.spark.sql.Column) = {
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), v.as("v"))
      Quantize.encode(e, Quantize.dimStats(e))
        .groupBy(col("d"))
        .agg(countDistinct(col("code")).as("n_codes"),
          min(col("code")).as("min_code"), max(col("code")).as("max_code"),
          count(when(col("code") === 0 || col("code") === 255, 1))
            .as("edge_hits"))
        .orderBy(col("d")).filter(col("d") <= 16)
    }
    val raw = Similarity.asDouble(col("embedding"))

    // ---- q118 shape (Dsir grams) ----
    def dsirOf(fenced: Boolean) = {
      val ts = split(col("text"), " ")
      val grams0 = zip_with(
        slice(ts, lit(1), size(ts) - 1), slice(ts, lit(2), size(ts) - 1),
        (a, b) => concat_ws(" ", a, b))
      val g = if (fenced) fence(grams0) else grams0
      Tables.documents(spark, dir)
        .select(col("doc_id"), g.as("gs"))
        .filter(size(col("gs")) > 0)
        .select(col("doc_id"), size(col("gs")).cast("long").as("n"),
          aggregate(transform(col("gs"), x => length(x).cast("long")),
            lit(0L), (a, x) => a + x).as("s"))
    }

    mat(q54of(raw)); mat(dsirOf(false)) // warm
    for (i <- 1 to 4) {
      time(s"q54 unfenced #$i")(mat(q54of(raw)))
      time(s"q54 fenced   #$i")(mat(q54of(fence(raw))))
      time(s"dsir unfenced #$i")(mat(dsirOf(false)))
      time(s"dsir fenced   #$i")(mat(dsirOf(true)))
    }
    spark.stop()
  }
}

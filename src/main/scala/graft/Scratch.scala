package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    val cand0 = time("candidatePairs (1st: band ckpt)") {
      SharedLsh.candidatePairs(spark, dir).localCheckpoint()
    }
    println(s"pairs: ${cand0.count()}")
    val cand = time("candidatePairs (2nd)") {
      SharedLsh.candidatePairs(spark, dir).localCheckpoint()
    }
    val sig = time("signatures (1st: ckpt)") {
      SharedLsh.signatures(spark, dir)
    }
    time("sig.count")(sig.count())
    val cdocs = time("cdocs distinct") {
      val c = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b"))).distinct().localCheckpoint()
      println(s"cdocs: ${c.count()}")
      c
    }
    val shc = time("shc build+ckpt") {
      docs.join(cdocs, "doc_id")
        .select(col("doc_id"), explode(
          Dedup.charShingles(col("text"), 5)).as("sh"))
        .distinct().localCheckpoint()
    }
    println(s"shc rows: ${shc.count()}")
    time("inter") {
      cand
        .join(shc.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(shc.select(col("doc_id").as("doc_b"), col("sh")),
          Seq("doc_b", "sh"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("i")).count()
    }
    time("full q172 (fresh)") {
      SparkEntry.queries("q172_minhash_calibration")(spark, dir).count()
    }
    time("full q172 (again)") {
      SparkEntry.queries("q172_minhash_calibration")(spark, dir).count()
    }
    spark.stop()
  }
}

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
    // warm the file listing + parquet footer read
    time("docs.count")(docs.count())
    time("shingle explode count") {
      docs.select(col("doc_id"),
        explode(Dedup.charShingles(col("text"), 5)).as("sh")).count()
    }
    time("shingle+2md5 count") {
      docs.select(col("doc_id"),
          explode(Dedup.charShingles(col("text"), 5)).as("sh"))
        .select(md5(concat(lit("m0"), col("sh"))).as("a"),
          md5(concat(lit("m1"), col("sh"))).as("b"))
        .filter(col("a") > col("b")).count()
    }
    time("minhash signatures") {
      Dedup.minhashSignatures(docs, "doc_id", "text", 5, 8).count()
    }
    val banded = time("lshBandKeys (checkpoint)") {
      Dedup.lshBandKeys(docs, "doc_id", "text", 5, 8, 2)
    }
    time("pairs from banded") {
      val a = banded.select(col("doc_id").as("doc_a"), col("bk"))
      val b = banded.select(col("doc_id").as("doc_b"), col("bk").as("bk2"))
      a.join(b, col("bk") === col("bk2") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct().count()
    }
    val edges = time("star edges") {
      val hubs = banded.groupBy(col("bk")).agg(min(col("doc_id")).as("hub"))
      banded.join(hubs, "bk")
        .filter(col("doc_id") =!= col("hub"))
        .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"))
        .distinct().localCheckpoint()
    }
    println(s"edges: ${edges.count()}")
    time("connected components") {
      Dedup.connectedComponents(edges).count()
    }
    time("connected components again") {
      Dedup.connectedComponents(edges).count()
    }
    spark.stop()
  }
}

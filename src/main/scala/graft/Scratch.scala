package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the driver contract).
  * Current use: the q196 stage-split audit (r7 VERDICT finding #1). */
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
    // q196 stage split, mirroring the query's own structure
    val txt = when(col("doc_id") % 7 === 0,
      concat_ws(" ", col("text"),
        lit("all rights reserved contact site admin for removal")))
      .otherwise(col("text"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), txt.as("txt"))
    time("warm: docs.count")(docs.count())
    val grams = time("stage1: grams ckpt") {
      docs.select(col("doc_id"), posexplode(
          graft.operators.TextAnalysis.wordNgrams(col("txt"), 8))
          .as(Seq("pos0", "g")))
        .select(col("doc_id"), (col("pos0") + 1).as("p"),
          unhex(md5(col("g"))).as("gh"))
        .localCheckpoint()
    }
    println(s"grams rows: ${grams.count()}")
    val boiler = grams.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= 3).select(col("gh"))
    time("stage2: boiler df-agg")(boiler.count())
    val cov = grams.join(boiler, Seq("gh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(collect_list(col("p")).as("ps"))
      .select(col("doc_id"),
        array_sort(array_distinct(flatten(transform(col("ps"),
          p => sequence(p, p + 7))))).as("covered"))
    time("stage3: cov semi+collect")(cov.count())
    val toks = graft.operators.TextAnalysis.tokens(col("txt"))
    val out = docs.join(cov, Seq("doc_id"))
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(col("covered")).cast("long").as("n_removed"),
        md5(concat_ws(" ", transform(
          array_except(sequence(lit(1), size(toks)), col("covered")),
          p => element_at(toks, p)))).as("new_hash"))
      .orderBy(col("doc_id"))
    time("stage4: rebuild (full query)")(out.count())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the driver contract).
  * Current use: q244 stage split — where do its ~12-15 s go? */
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.operators.Dedup
    val s = spark
    time("warm artifacts") {
      SharedLsh.components(s, dir).count()
      SharedLsh.candidatePairs(s, dir).count()
    }
    for (i <- 1 to 2) {
      val comps = SharedLsh.components(s, dir)
      val big = time(s"big #$i")(
        comps.groupBy(col("component")).agg(count(lit(1)).as("csize"))
          .filter(col("csize") >= 11))
      val members = time(s"members ckpt #$i")(
        comps.join(big.hint("shuffle_hash"), "component").localCheckpoint())
      val edges = SharedLsh.candidatePairs(s, dir)
        .join(members.select(col("doc_id").as("doc_a"), col("component"))
          .hint("shuffle_hash"), "doc_a")
      val sh = time(s"shingles ckpt #$i")(Dedup.shingleRows(
        Tables.documents(s, dir).join(
          members.select(col("doc_id")).hint("shuffle_hash"), "doc_id"),
        "doc_id", "text", 5).localCheckpoint())
      val szs = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = edges
        .join(sh.select(col("doc_id").as("doc_a"), col("sh"))
          .hint("shuffle_hash"), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh"))
          .hint("shuffle_hash"), Seq("doc_b", "sh"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
      val strong = time(s"strong ckpt #$i")(edges
        .join(inter.hint("shuffle_hash"), Seq("doc_a", "doc_b"), "left")
        .join(szs.select(col("doc_id").as("doc_a"), col("sz").as("sza"))
          .hint("shuffle_hash"), "doc_a")
        .join(szs.select(col("doc_id").as("doc_b"), col("sz").as("szb"))
          .hint("shuffle_hash"), "doc_b")
        .filter(expr("""CAST(coalesce(i, 0L) AS DECIMAL(38,0)) * 1000000
          div (sza + szb - coalesce(i, 0L))""") >= 200000L)
        .select(col("component"), col("doc_a"), col("doc_b"))
        .localCheckpoint())
      val r = time(s"CC fixpoint #$i")(
        Dedup.connectedComponentsWithStats(
          strong.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b", 50))
      println(s"rounds=${r.rounds} converged=${r.converged}")
      time(s"census #$i")(r.components.count())
    }
    spark.stop()
  }
}

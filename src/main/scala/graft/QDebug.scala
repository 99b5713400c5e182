package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for timing/plan inspection of a single query. */
object QDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "all") {
      SparkEntry.queries.foreach { case (n, fn) =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"$n%-28s $c%6d rows ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    } else {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n2 = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"run$i: $n2 rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: print ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Timing protocol: one warmup pass (JVM, codegen, parquet file listing
  * all land there), then `SPARK_GRAFT_BENCH_PASSES` (default 3) timed
  * passes over all queries; the reported per-query time is the MINIMUM
  * across passes and "total" is the sum of those minima. The host VM
  * occasionally freezes for tens of seconds under host-level CPU
  * throttle; interleaved passes + min recover the steady-state number
  * instead of charging a random query for the freeze.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BENCH_MATERIALIZE: time a row-hash aggregate instead
    // of count(). count() lets Catalyst PRUNE projection work above
    // the last mandatory shuffle (q210's r8 entry "0.157 s" never
    // evaluated its scoring — SCALE.md lesson #5's measurement
    // artifact); hashing every output column forces full
    // materialization. Kept off by default so round-over-round
    // numbers stay comparable; the materialized snapshot persists to
    // its own file (BENCH_MATERIALIZED.json) and tags its JSON line.
    val materialize = sys.env.contains("SPARK_GRAFT_BENCH_MATERIALIZE")
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      if (!materialize) { df.count(); () }
      else {
        import org.apache.spark.sql.functions.{bit_xor, col, to_json, struct, xxhash64}
        // xxhash64 rejects MapType; fall back to hashing the JSON form
        val probe =
          try df.select(xxhash64(df.columns.map(col): _*).as("_h"))
          catch { case _: org.apache.spark.sql.AnalysisException =>
            df.select(xxhash64(to_json(struct(df.columns.map(col): _*)))
              .as("_h"))
          }
        probe.agg(bit_xor(org.apache.spark.sql.functions.col("_h")))
          .collect()
        ()
      }
    // a failing query must NOT record its fast-fail wall time as a
    // valid pass — failures land in an "errors" map instead
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def runOne(name: String,
               fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { consume(fn(spark, sfDir)); true }
      catch {
        case t: Throwable =>
          errors(name) = Option(t.getMessage).getOrElse(t.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
          false
      }
    // dev-only: comma-separated query-name filter for targeted profiling
    // (driver never sets it — full suite by default)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val queries = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // warmup pass — timed, and per-artifact build seconds recorded via
    // ArtifactTimer (r12 verdict: session artifacts are built here, so
    // without these fields the per-query minima silently stop charging
    // the kernel anywhere; additions-only, the line stays parseable by
    // the old consumer)
    ArtifactTimer.clear()
    val w0 = System.nanoTime()
    queries.foreach { case (name, fn) => runOne(name, fn) }
    val warmupSec = (System.nanoTime() - w0) / 1e9
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (_ <- 1 to passes) {
      queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = runOne(name, fn)
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok)
          best.updateWith(name)(prev => Some(prev.fold(dt)(math.min(_, dt))))
      }
    }
    // Round to 3 decimals: at 85 queries, full Double precision (~17 sig
    // digits each) made the r3 JSON line long enough that the driver's
    // output tail-window truncated it mid-dict ("parsed": null). 1 ms
    // resolution is below measurement noise anyway.
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = best.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val errs = errors.map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }
      .mkString("{", ",", "}")
    val total = if (best.nonEmpty) best.values.sum else 0.0
    // a filtered profiling run is NOT a full-suite result: mark the
    // JSON line and never let it clobber the round-evidence file
    val filteredTag = (if (only.isDefined) ""","filtered":true""" else "") +
      (if (materialize) ""","materialized":true""" else "")
    // key order matters: the per-query dict goes FIRST and the headline
    // totals LAST, so a consumer that captures only the tail of a long
    // line still sees n_queries/errors/total even when the dict is
    // truncated mid-entry (162 queries ≈ 4 KB; full-line JSON is also
    // persisted to BENCH_LOCAL.json as the truncation-proof record)
    val arts = ArtifactTimer.snapshot.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"\"${esc(k)}\":${r3(v)}" }
      .mkString("{", ",", "}")
    val line =
      s"""{"queries":$qs$filteredTag,"warmup_sec":${r3(warmupSec)},"artifacts":$arts,"sf":"$sfDir","n_queries":${best.size},"errors":$errs,"metric":"total","unit":"sec","value":${r3(total)}}"""
    // stop Spark BEFORE printing so the JSON line is the last stdout line
    // ahead of sbt's [success] banner — keeps it inside the driver's tail
    // window; also persist to a file as a truncation-proof fallback.
    spark.stop()
    if (only.isEmpty)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(
          if (materialize) "BENCH_MATERIALIZED.json" else "BENCH_LOCAL.json"),
        (line + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
    println(line)
  }
}

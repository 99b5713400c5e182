package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{ColumnProfile, StatsCatalog}

class StatsCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq(
    ColumnProfile.ProfCol("x", numeric = true),
    ColumnProfile.ProfCol("s", numeric = false))

  private def sample = Seq(
    (1.0, "a"), (2.0, "b"), (2.0, "b"), (3.0, "c"))
    .toDF("x", "s")

  test("profile round-trips through the catalog; point lookups read back") {
    val dir = Files.createTempDirectory("graft-stats").toString
    val prof = ColumnProfile.profile(sample, cols, exact = true)
    StatsCatalog.writeProfile(dir, "t1", prof)
    val back = StatsCatalog.readProfile(spark, dir, "t1")
    assert(back.columns.sorted.toSeq == prof.columns.sorted.toSeq)
    assert(back.orderBy("col_name").collect().toSeq ==
      prof.orderBy("col_name").collect().toSeq)
    assert(StatsCatalog.ndv(spark, dir, "t1", "x") == Some(3L))
    assert(StatsCatalog.ndv(spark, dir, "t1", "s") == Some(3L))
    assert(StatsCatalog.nullCount(spark, dir, "t1", "x") == Some(0L))
    assert(StatsCatalog.ndv(spark, dir, "t1", "missing").isEmpty)
  }

  test("re-profiling one table replaces only that table's partition") {
    val dir = Files.createTempDirectory("graft-stats2").toString
    StatsCatalog.writeProfile(dir, "a",
      ColumnProfile.profile(sample, cols, exact = true))
    StatsCatalog.writeProfile(dir, "b",
      ColumnProfile.profile(sample.limit(2), cols, exact = true))
    // refresh table a from a grown frame; b must be untouched
    StatsCatalog.writeProfile(dir, "a",
      ColumnProfile.profile(
        sample.union(Seq((9.0, "z")).toDF("x", "s")), cols, exact = true))
    assert(StatsCatalog.ndv(spark, dir, "a", "x") == Some(4L))
    assert(StatsCatalog.ndv(spark, dir, "b", "x") == Some(2L))
    // exactly one stored row per (table, column)
    val all = spark.read.parquet(s"$dir/profile")
    assert(all.groupBy("table_name", "col_name").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("histogram round-trips; bounds come back in bucket order") {
    val dir = Files.createTempDirectory("graft-stats3").toString
    val hist = Seq((0, 10L, 0.0, 2.5), (1, 10L, 2.5, 5.0), (2, 10L, 5.0, 9.0))
      .toDF("bucket", "n", "vmin", "vmax")
    StatsCatalog.writeHistogram(dir, "t1", "x", hist)
    val back = StatsCatalog.readHistogram(spark, dir, "t1", "x")
    assert(back.orderBy("bucket").collect().toSeq ==
      hist.orderBy("bucket").collect().toSeq)
    assert(StatsCatalog.histogramBounds(spark, dir, "t1", "x") ==
      Seq(2.5, 5.0, 9.0))
  }

  test("file stats round-trip and prove skipping on a range-clustered layout") {
    val dir = Files.createTempDirectory("graft-stats5").toString
    val data = Files.createTempDirectory("graft-fstat").resolve("t").toString
    // range-partitioned by value -> per-file min/max are tight slices
    spark.range(1000).selectExpr("id", "cast(id as double) AS v")
      .repartitionByRange(4, col("v"))
      .write.parquet(data)
    val stats = StatsCatalog.collectFileStats(spark, data, Seq("v"))
    assert(stats.count() >= 4, "one row per file expected")
    StatsCatalog.writeFileStats(dir, "t", stats)
    val back = StatsCatalog.readFileStats(spark, dir, "t")
    assert(back.count() == stats.count())
    // a point-range predicate must skip most files...
    val skip = StatsCatalog.skippableFiles(spark, dir, "t", "v", 10.0, 20.0)
    assert(skip.size >= stats.count() - 2,
      s"clustered layout should skip all but ~1 file, skipped ${skip.size}")
    // ...and never skip a file that contains matching rows
    val matching = spark.read.parquet(data)
      .filter(col("v").between(10.0, 20.0))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(skip.toSet.intersect(matching).isEmpty, "skipped a needed file")
  }

  test("z-ordered layout yields a skip index effective on BOTH dimensions") {
    // the payoff the ZOrder writer exists for: after interleaved-key
    // clustering, per-file min/max are tight in x AND y, so a range
    // predicate on EITHER dimension prunes files (a plain range
    // partition by x would prune only x)
    val dir = Files.createTempDirectory("graft-stats6").toString
    val data = Files.createTempDirectory("graft-zskip").resolve("t").toString
    val grid = spark.range(4096)
      .selectExpr("id % 64 AS x", "id DIV 64 AS y")
    graft.operators.ZOrder.writeZOrdered(grid, Seq("x", "y"), bits = 6,
      numFiles = 8, path = data)
    val stats = StatsCatalog.collectFileStats(spark, data, Seq("x", "y"))
    StatsCatalog.writeFileStats(dir, "z", stats)
    val skipX = StatsCatalog.skippableFiles(spark, dir, "z", "x", 0.0, 7.0)
    val skipY = StatsCatalog.skippableFiles(spark, dir, "z", "y", 0.0, 7.0)
    assert(skipX.size >= 2 && skipY.size >= 2,
      s"z-order should prune both dims, got x=${skipX.size} y=${skipY.size}")
    // never skip a file holding matching rows — on either dimension
    def needed(c: String) = spark.read.parquet(data)
      .filter(col(c).between(0, 7))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(skipX.toSet.intersect(needed("x")).isEmpty)
    assert(skipY.toSet.intersect(needed("y")).isEmpty)
  }

  test("the q76 equi-depth histogram persists and reads back as stats") {
    val dir = Files.createTempDirectory("graft-stats4").toString
    val hist = Queries.all("q76_equidepth_hist")(spark, sf())
    StatsCatalog.writeHistogram(dir, "events", "value", hist)
    val bounds = StatsCatalog.histogramBounds(spark, dir, "events", "value")
    assert(bounds.size == hist.count())
    assert(bounds == bounds.sorted, "equi-depth bounds must ascend")
  }
}

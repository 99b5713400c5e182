package graft

import org.apache.spark.sql.functions._

import graft.operators.NdvSketch

/** Linear-counting NDV sketch (q84's kernel). */
class NdvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def bitmap(df: org.apache.spark.sql.DataFrame,
                     log2m: Int): Seq[Long] =
    df.agg(NdvSketch.sketch(col("pos"), log2m).as("sk"))
      .as[Seq[Long]].head()

  test("occupied equals the exact distinct-position count, any partitioning") {
    val rnd = new scala.util.Random(3)
    val vals = (1 to 5000).map(_ => s"v${rnd.nextInt(800)}")
    val df = vals.toDF("v")
      .select(NdvSketch.position(col("v"), 14).as("pos"))
    val exact = df.distinct().count()
    for (parts <- Seq(1, 16)) {
      val sk = bitmap(df.repartition(parts), 14)
      assert(NdvSketch.occupied(sk) == exact, s"parts=$parts")
    }
  }

  test("merging slice bitmaps equals the whole-stream bitmap") {
    val all = (1 to 4000).map(i => s"item$i")
    val slices = all.grouped(1000).toSeq
    val log2m = 14
    val whole = bitmap(all.toDF("v")
      .select(NdvSketch.position(col("v"), log2m).as("pos")), log2m)
    val merged = slices
      .map(s => bitmap(s.toDF("v")
        .select(NdvSketch.position(col("v"), log2m).as("pos")), log2m))
      .reduce { (a, b) =>
        a.zip(b).map { case (x, y) => x | y }
      }
    assert(merged == whole)
  }

  test("estimate is within 3% below half load") {
    val n = 5000
    val df = (1 to n).map(i => s"u$i").toDF("v")
      .select(NdvSketch.position(col("v"), 16).as("pos")) // load 0.076
    val est = NdvSketch.estimate(bitmap(df, 16), 16)
    assert(math.abs(est - n) <= 0.03 * n, s"estimate $est for n=$n")
  }

  test("a saturated bitmap returns the upper sentinel, not infinity") {
    val full = Seq.fill(1)(-1L) // 64 bits all set at log2m=6
    val est = NdvSketch.estimate(full, 6)
    assert(est == 64 * math.log(64.0))
    assert(NdvSketch.occupied(full) == 64L)
  }
}

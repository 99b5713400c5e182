package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{MixtureSample, WeightedSample}

/** Temperature mixture sampling: determinism, the α regimes, the
  * implicit min(1,·) cap, and the narrow-plan contract. */
class MixtureSampleSpec extends SparkSpec {

  /** 300 docs over a skewed domain: 200 big / 80 mid / 20 small. */
  private def docs: DataFrame =
    spark.range(300).select(col("id"),
      when(col("id") < 200, "big")
        .when(col("id") < 280, "mid")
        .otherwise("small").as("dom"))

  test("weightScaled hits the exact integer in the sqrt regime") {
    val w = docs.limit(1)
      .select(MixtureSample.weightScaled(lit(200L), 0.5).as("w"))
      .collect().head.getLong(0)
    assert(w == math.floor(math.sqrt(200.0) * 1e6).toLong) // 14142135
  }

  test("deterministic and partitioning-invariant") {
    def ids(d: DataFrame): Set[Long] =
      MixtureSample.temperatureSample(d, "dom", "id", 150L, 0.5, "s")
        .select(col("id")).collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    assert(a == ids(docs))
    assert(a == ids(docs.repartition(7)))
    assert(a.nonEmpty)
  }

  test("alpha=0.5 upsamples rare domains; rate >= 1 keeps everything") {
    val kept = MixtureSample
      .temperatureSample(docs, "dom", "id", 150L, 0.5, "s")
      .groupBy(col("dom")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // small's rate T*w/(W*n) = 1.22 > 1: the comparison keeps all 20
    assert(kept("small") == 20L)
    // relative upsampling: kept fraction grows as domain size shrinks
    assert(kept("big").toDouble / 200 < kept("mid").toDouble / 80)
    assert(kept("mid").toDouble / 80 < 1.0)
  }

  test("alpha=1 degenerates to domain-independent Bernoulli T/N") {
    val mix = MixtureSample
      .temperatureSample(docs, "dom", "id", 150L, 1.0, "s")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // u*n_s*W < T*w_s*2^32 with w_s = n_s*1e6, W = N*1e6 reduces to
    // u*N < T*2^32 — exactly poissonInclude(w=T, wMax=N)
    val plain = docs.filter(WeightedSample.poissonInclude(
        "s", col("id"), lit(150L), lit(300L)))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(mix == plain)
  }

  test("corpus side stays narrow: broadcast join, no sort-merge") {
    val plan = MixtureSample
      .temperatureSample(docs, "dom", "id", 150L, 0.5, "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("frozen-policy streaming ingest agrees with batch for any slicing") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger

    val d = Files.createTempDirectory("graft-smix")
    val in = d.resolve("in"); Files.createDirectories(in)
    val out = d.resolve("out").toString
    val rows = (0L until 120L).map(i =>
      (i, if (i % 4 == 0) "rare" else "big"))
    rows.grouped(50).zipWithIndex.foreach { case (g, i) =>
      Files.write(in.resolve(s"r$i.csv"),
        g.map { case (id, dm) => s"$id;$dm" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
    }
    val schema = "id LONG, dom STRING"
    val batch = spark.read.schema(schema)
      .option("delimiter", ";").csv(in.toString)
    val stats = MixtureSample.domainStats(batch, "dom", 0.5)
      .localCheckpoint() // freeze the policy

    val stream = spark.readStream.schema(schema)
      .option("delimiter", ";").option("maxFilesPerTrigger", "1")
      .csv(in.toString)
    val q = MixtureSample
      .temperatureSampleWith(stream, stats, "dom", "id", 60L, "s")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", d.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.read.parquet(out).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    val want = MixtureSample
      .temperatureSampleWith(batch, stats, "dom", "id", 60L, "s")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(want.nonEmpty && want.size < 120)
  }
}

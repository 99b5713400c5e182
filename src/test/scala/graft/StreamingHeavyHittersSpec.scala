package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingHeavyHitters

class StreamingHeavyHittersSpec extends SparkSpec {

  private def runBatches(capacity: Int,
                         batches: Seq[Seq[String]]): (String, Map[String, Long]) = {
    val d = Files.createTempDirectory("graft-shh")
    val in = d.resolve("in"); Files.createDirectories(in)
    val dir = d.resolve("sk").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      Files.write(in.resolve(s"b$i.csv"),
        (rows.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      val items = spark.readStream.schema("item STRING").csv(in.toString)
      val q = StreamingHeavyHitters.run(items, "item", capacity, dir,
        d.resolve("ckpt").toString, _.trigger(Trigger.AvailableNow()))
      q.awaitTermination()
    }
    (dir, StreamingHeavyHitters.summary(spark, dir, capacity))
  }

  test("exact when capacity >= distinct: merged batches equal global counts") {
    val batches = Seq(
      Seq.fill(30)("a") ++ Seq.fill(10)("b"),
      Seq.fill(5)("a") ++ Seq.fill(20)("c"),
      Seq.fill(1)("b") ++ Seq.fill(2)("d"))
    val (dir, got) = runBatches(capacity = 16, batches)
    assert(got == Map("a" -> 35L, "b" -> 11L, "c" -> 20L, "d" -> 2L))
    // one sketch artifact per micro-batch (idempotence unit)
    val batchDirs = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("batch="))
    assert(batchDirs >= 1)
  }

  test("under eviction the merged summary keeps the MG bound") {
    val rnd = new scala.util.Random(23)
    val batches = (0 until 4).map { _ =>
      Seq.fill(2500) {
        val r = rnd.nextInt(100)
        if (r < 35) "heavy" else s"cold${rnd.nextInt(400)}"
      }
    }
    val n = 10000L
    val capacity = 16
    val exact = batches.flatten.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val (_, sk) = runBatches(capacity, batches)
    val bound = n / (capacity + 1)
    assert(sk.contains("heavy"))
    sk.foreach { case (k, est) =>
      assert(est <= exact(k), s"$k overcounted")
      assert(exact(k) - est <= bound, s"$k undercount beyond bound")
    }
    assert(sk.size <= capacity)
  }
}

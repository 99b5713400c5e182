package graft

import org.apache.spark.sql.functions._

import graft.operators.{AudioWav, VideoContainer}
import graft.operators.VideoContainer.ContainerMeta

/** MP4 box-walk + Matroska EBML walk: writer→parser round trips over
  * both version legs, the log sources' bad-byte tolerance (every
  * strict prefix and seeded fuzz → None, never a throw), and the
  * DataFrame surface (meta columns + the parsed-duration frame plan). */
class VideoContainerSpec extends SparkSpec {

  private val mp4 = VideoContainer.writeMp4("isom", 600L, 7200L,
    Seq("vide", "soun"))
  private val mkv = VideoContainer.writeMkv("webm", 1000000L, 34567.0,
    Seq(1, 2, 17))

  test("mp4 round trip: brand, timescale, duration, tracks, handlers") {
    assert(VideoContainer.parseMp4(mp4).contains(ContainerMeta(
      "mp4", "isom", 600L, 12000L, 2, Seq("vide", "soun"))))
  }

  test("mp4 version-1 mvhd (64-bit duration past the 32-bit line)") {
    val b = VideoContainer.writeMp4("mp42", 90000L, 9000000000L,
      Seq("vide"), v1 = true)
    assert(VideoContainer.parseMp4(b).contains(ContainerMeta(
      "mp4", "mp42", 90000L, 100000000L, 1, Seq("vide"))))
  }

  test("mkv round trip: doctype, tick rate, duration ms, track kinds") {
    assert(VideoContainer.parseMkv(mkv).contains(ContainerMeta(
      "mkv", "webm", 1000L, 34567L, 3, Seq("vide", "soun", "subt"))))
  }

  test("mkv honors a non-default TimecodeScale") {
    // 25 ms ticks: 1234 ticks → 30850 ms, tick rate 40 Hz
    val b = VideoContainer.writeMkv("matroska", 25000000L, 1234.0, Seq(2))
    assert(VideoContainer.parseMkv(b).contains(ContainerMeta(
      "mkv", "matroska", 40L, 30850L, 1, Seq("soun"))))
  }

  test("every strict prefix of either container parses to None") {
    for (n <- 0 until mp4.length)
      assert(VideoContainer.parse(mp4.take(n)).isEmpty, s"mp4 prefix $n")
    for (n <- 0 until mkv.length)
      assert(VideoContainer.parse(mkv.take(n)).isEmpty, s"mkv prefix $n")
  }

  test("seeded fuzz and bit flips never throw") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      VideoContainer.parse(b) // must not throw
    }
    for (base <- Seq(mp4, mkv); i <- base.indices) {
      val mut = base.clone()
      mut(i) = (mut(i) ^ 0xff).toByte
      VideoContainer.parse(mut) // tolerate, never throw
    }
  }

  test("withContainerMeta parses video payloads and nulls the rest") {
    val wav = AudioWav.writePcm16Wav(Array[Short](1, 2, 3), 8000, 1)
    val rows = Seq(
      (1L, mp4), (2L, mkv), (3L, wav), (4L, "not a container".getBytes),
      (5L, null.asInstanceOf[Array[Byte]]))
    val df = spark.createDataFrame(rows).toDF("media_id", "payload")
    val got = VideoContainer.withContainerMeta(df)
      .select(col("media_id"), col("container"), col("brand"),
        col("duration_ms"), col("n_tracks"))
      .orderBy(col("media_id")).collect()
    assert(got(0).getString(1) == "mp4" && got(0).getLong(3) == 12000L)
    assert(got(1).getString(1) == "mkv" && got(1).getString(2) == "webm")
    assert((2 to 4).forall(i => got(i).isNullAt(1)))
  }

  test("frame plan derives from parsed duration, video tracks only") {
    val audioOnlyMp4 = VideoContainer.writeMp4("isom", 600L, 7200L,
      Seq("soun"))
    val df = spark.createDataFrame(Seq(
        (1L, mp4), (2L, audioOnlyMp4), (3L, mkv)))
      .toDF("media_id", "payload")
    val plan = VideoContainer.framePlanFromMeta(
      VideoContainer.withContainerMeta(df), fps = 10, everyK = 3)
    val got = plan.orderBy(col("media_id")).collect()
    // mp4: 12000 ms · 10 fps = 120 frames → 0,3,…,117 (40 indexes);
    // audio-only mp4 excluded; mkv: 34567 ms → 345 frames → 115 indexes
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val idx1 = got(0).getSeq[Long](1)
    assert(idx1.size == 40 && idx1.head == 0L && idx1.last == 117L)
    assert(got(1).getSeq[Long](1).size == 115)
  }
}

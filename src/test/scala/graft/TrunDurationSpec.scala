package graft

import org.apache.spark.sql.functions._

import graft.operators.VideoContainer
import graft.operators.VideoContainer.{FragmentMeta, TrafSpec}

/** trun sample-duration sums (ISO/IEC 14496-12 §8.8.8) — the timing
  * completion of the fragment census: per-sample durations, the tfhd
  * default fallback, the honest unknown when neither is present, and
  * the per-sample stride walk when size/flags/composition-offset
  * fields are interleaved with durations. */
class TrunDurationSpec extends SparkSpec {

  test("per-sample trun durations sum per fragment") {
    val b = VideoContainer.writeFmp4Timed("cmfc", 600L, 7200L, Seq(
      1L -> Seq(TrafSpec(1L, 3L, None, Some(Seq(100L, 200L, 300L)))),
      2L -> Seq(TrafSpec(1L, 2L, None, Some(Seq(400L, 400L))))))
    assert(VideoContainer.parseFragments(b).contains(Seq(
      FragmentMeta(1L, Seq(1L), 3L, 600L, durKnown = true),
      FragmentMeta(2L, Seq(1L), 2L, 800L, durKnown = true))))
  }

  test("tfhd default_sample_duration covers count-only truns") {
    val b = VideoContainer.writeFmp4Timed("cmfc", 600L, 7200L, Seq(
      1L -> Seq(TrafSpec(7L, 4L, Some(250L), None))))
    assert(VideoContainer.parseFragments(b).contains(Seq(
      FragmentMeta(1L, Seq(7L), 4L, 1000L, durKnown = true))))
  }

  test("no duration source anywhere -> durKnown false, partial sum kept") {
    val b = VideoContainer.writeFmp4Timed("cmfc", 600L, 7200L, Seq(
      1L -> Seq(
        TrafSpec(1L, 2L, None, Some(Seq(10L, 20L))),
        TrafSpec(2L, 5L, None, None)))) // neither per-sample nor default
    assert(VideoContainer.parseFragments(b).contains(Seq(
      FragmentMeta(1L, Seq(1L, 2L), 7L, 30L, durKnown = false))))
  }

  test("zero-sample trun without a default is still fully known") {
    val b = VideoContainer.writeFmp4Timed("cmfc", 600L, 7200L, Seq(
      1L -> Seq(TrafSpec(3L, 0L, None, None))))
    assert(VideoContainer.parseFragments(b).contains(Seq(
      FragmentMeta(1L, Seq(3L), 0L, 0L, durKnown = true))))
  }

  // hand-assembled boxes for layouts writeFmp4Timed doesn't emit
  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def boxBytes(typ: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body

  test("stride walk: durations interleaved with size/flags/cto fields") {
    // trun flags 0x100|0x200|0x400|0x800 + data_offset (0x01): two
    // samples (dur, size, flags, cto) — only the durations may sum
    val trun = boxBytes("trun",
      be32(0x001L | 0x100L | 0x200L | 0x400L | 0x800L) ++ be32(2L) ++
        be32(999L) ++ // data_offset, must be skipped
        be32(100L) ++ be32(4096L) ++ be32(0L) ++ be32(5L) ++
        be32(150L) ++ be32(2048L) ++ be32(0L) ++ be32(6L))
    val tfhd = boxBytes("tfhd", be32(0L) ++ be32(9L))
    val moof = boxBytes("moof",
      boxBytes("mfhd", be32(0L) ++ be32(1L)) ++
        boxBytes("traf", tfhd ++ trun))
    val b = VideoContainer.writeMp4("cmfc", 600L, 7200L, Seq("vide")) ++ moof
    assert(VideoContainer.parseFragments(b).contains(Seq(
      FragmentMeta(1L, Seq(9L), 2L, 250L, durKnown = true))))
  }

  test("trun claiming more samples than its body holds is malformed") {
    val trun = boxBytes("trun",
      be32(0x100L) ++ be32(3L) ++ be32(100L)) // claims 3, carries 1
    val moof = boxBytes("moof",
      boxBytes("mfhd", be32(0L) ++ be32(1L)) ++
        boxBytes("traf",
          boxBytes("tfhd", be32(0L) ++ be32(1L)) ++ trun))
    val b = VideoContainer.writeMp4("cmfc", 600L, 7200L, Seq("vide")) ++ moof
    assert(VideoContainer.parseFragments(b).isEmpty)
  }

  test("census carries dur_ticks/dur_known and completes the frame plan") {
    import spark.implicits._
    // 7200 ticks of media at timescale 600 = 12 s -> 288 frames at 24
    // fps: the fragment durations, not the mvhd header, are what a
    // CMAF stream actually certifies
    val timed = VideoContainer.writeFmp4Timed("cmfc", 600L, 999L, Seq(
      1L -> Seq(TrafSpec(1L, 2L, None, Some(Seq(3600L, 1800L)))),
      2L -> Seq(TrafSpec(1L, 1L, Some(1800L), None))))
    val df = Seq((1L, timed)).toDF("media_id", "payload")
    val c = VideoContainer.withFragmentCensus(df)
      .select(col("media_id"), col("dur_ticks"), col("dur_known"),
        // mvhd timescale of the fixture is 600 ticks/s
        expr("dur_ticks * 24 div 600").as("n_frames"))
      .collect()(0)
    assert(c.getLong(c.fieldIndex("dur_ticks")) == 7200L)
    assert(c.getBoolean(c.fieldIndex("dur_known")))
    assert(c.getLong(c.fieldIndex("n_frames")) == 288L)
  }
}

package graft

import org.apache.spark.sql.Row

import graft.operators.Subtitles

/** WebVTT cue census: exact timing math, tag stripping, NOTE/STYLE
  * skipping, malformed-block counting (tolerance, never a throw),
  * overlap detection, and the headerless-track invalid path. */
class SubtitlesSpec extends SparkSpec {
  import spark.implicits._

  private def census(rows: (Long, String)*): Map[Long, Row] =
    Subtitles.withCueCensus(rows.toSeq.toDF("track_id", "vtt"),
        "track_id", "vtt")
      .collect().map(r => r.getLong(0) -> r).toMap

  private val good =
    """WEBVTT - demo track
      |
      |intro
      |00:00:01.000 --> 00:00:04.000
      |<i>Hello</i> there
      |
      |NOTE this block is a comment, not a cue
      |
      |00:00:04.000 --> 01:00:00.500 align:start
      |Second <v Ann>cue</v> line one
      |line two
      |""".stripMargin

  test("exact cue math on a well-formed track") {
    val r = census((1L, good))(1L)
    assert(r.getBoolean(1)) // valid
    assert(r.getLong(2) == 2, "n_cues")
    assert(r.getLong(3) == 0, "n_malformed")
    // "Hello there" = 11 chars; "Second cue line one line two" = 28
    assert(r.getLong(4) == 39, "n_chars")
    // 3000 ms + (3600000.5s - 4s → 3596500 ms)
    assert(r.getLong(5) == 3000L + 3596500L, "sub_ms")
    assert(r.getLong(6) == 3599500L, "span_ms")
    assert(r.getLong(7) == 39L * 1000000L / (3000L + 3596500L),
      "cps_milli")
    assert(r.getLong(8) == 0, "n_overlaps")
  }

  test("hour-less timestamps, overlap, and id-less cues") {
    val vtt =
      """WEBVTT
        |
        |00:10.000 --> 00:20.000
        |abc
        |
        |00:15.000 --> 00:25.000
        |defg
        |""".stripMargin
    val r = census((2L, vtt))(2L)
    assert(r.getLong(2) == 2 && r.getLong(8) == 1,
      "second cue starts before the first ends")
    assert(r.getLong(5) == 20000L && r.getLong(6) == 15000L)
    assert(r.getLong(4) == 7)
  }

  test("malformed blocks are counted, never thrown on") {
    val vtt =
      """WEBVTTx nope
        |""".stripMargin
    val r = census((3L, vtt))(3L)
    assert(!r.getBoolean(1) && r.isNullAt(2),
      "headerless track is invalid with a null census")

    val junk =
      """WEBVTT
        |
        |this block has no timing line at all
        |
        |STYLE
        |::cue { color: red }
        |
        |00:00:00.000 --> 00:00:01.000
        |ok
        |""".stripMargin
    val r2 = census((4L, junk))(4L)
    assert(r2.getBoolean(1) && r2.getLong(2) == 1 && r2.getLong(3) == 1,
      "one cue, one malformed block, STYLE skipped")
  }

  test("a long cue overlapping non-adjacent later cues counts each") {
    // cue1 spans 0-100 s; cue2 (10-20) and cue3 (30-40) BOTH rewind
    // behind the running max end (100 s) even though cue3 does not
    // overlap its adjacent predecessor — the adjacent-pair rule would
    // report 1, the running-max rule reports 2
    val vtt =
      """WEBVTT
        |
        |00:00:00.000 --> 00:01:40.000
        |long
        |
        |00:00:10.000 --> 00:00:20.000
        |a
        |
        |00:00:30.000 --> 00:00:40.000
        |b
        |""".stripMargin
    val r = census((10L, vtt))(10L)
    assert(r.getLong(2) == 3 && r.getLong(8) == 2,
      "both later cues rewind behind the running max of prior ends")
  }

  test("a cue sharing the header block is still parsed") {
    val vtt =
      """WEBVTT
        |00:00:01.000 --> 00:00:02.000
        |glued to the header
        |
        |00:00:03.000 --> 00:00:04.000
        |normal
        |""".stripMargin
    val r = census((11L, vtt))(11L)
    assert(r.getBoolean(1) && r.getLong(2) == 2 && r.getLong(3) == 0,
      "header-sharing cue is a cue, not dropped or malformed")
    assert(r.getLong(4) == 19 + 6, "both payloads counted")

    // timing-less header metadata stays with the header: not a cue,
    // not malformed
    val meta =
      """WEBVTT
        |X-TIMESTAMP-MAP=LOCAL:00:00:00.000,MPEGTS:0
        |
        |00:00:03.000 --> 00:00:04.000
        |normal
        |""".stripMargin
    val r2 = census((12L, meta))(12L)
    assert(r2.getBoolean(1) && r2.getLong(2) == 1 && r2.getLong(3) == 0,
      "metadata line is neither cue nor malformed")
  }

  test("null and empty payloads take the invalid path") {
    val rows = Seq((5L, null.asInstanceOf[String]), (6L, ""))
    val m = census(rows: _*)
    assert(!m(5L).getBoolean(1) && !m(6L).getBoolean(1))
  }

  test("SRT: comma timings, index lines, headerless validity") {
    val srt =
      """1
        |00:00:01,000 --> 00:00:04,000
        |Hello there
        |
        |2
        |00:01:00,500 --> 00:01:02,000
        |<i>Bye</i>
        |""".stripMargin
    val m = Subtitles.withSrtCueCensus(
        Seq((7L, srt), (8L, "not a subtitle file"),
          (9L, null.asInstanceOf[String])).toDF("track_id", "vtt"),
        "track_id", "vtt")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r = m(7L)
    assert(r.getBoolean(1) && r.getLong(2) == 2, "two cues parse")
    assert(r.getLong(3) == 0, "index lines ride their cue blocks")
    assert(r.getLong(4) == 14, "'Hello there' + 'Bye' after tag strip")
    assert(r.getLong(5) == 3000L + 1500L && r.getLong(6) == 61000L)
    assert(!m(8L).getBoolean(1) && m(8L).isNullAt(2),
      "zero parseable cues => invalid, null census")
    assert(!m(9L).getBoolean(1), "null payload => invalid")
  }

  test("census is per-row scan work: no exchange in the plan") {
    val df = Subtitles.withCueCensus(
      Seq((1L, good)).toDF("track_id", "vtt"), "track_id", "vtt")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"per-row census must not shuffle:\n$p")
  }
}

package graft

import graft.operators.Mp3Container

/** MP3 walk: ID3v2.2/2.3/2.4 tag-frame census, MPEG frame tiling
  * with the public bitrate/samplerate tables, VBR detection, exact
  * sample totals, ID3v1 trailer — and the never-throw malformed
  * contract (the OggContainerSpec discipline). All fixtures are
  * hand-assembled from the public header layouts. */
class Mp3ContainerSpec extends SparkSpec {
  import spark.implicits._

  /** MPEG1 Layer III frame: 0xFF 0xFB, bitrate/samplerate indices per
    * ISO 11172-3; body zeros. 128 kbps @ 44100 → 417+pad bytes. */
  private def frameV1L3(brIdx: Int, srIdx: Int, pad: Int): Array[Byte] = {
    val br = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)(brIdx) * 1000
    val sr = Array(44100, 48000, 32000)(srIdx)
    val len = 144 * br / sr + pad
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = 0xfb.toByte // v1, layer III, no CRC
    b(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    b
  }

  /** MPEG2 Layer III (0xFF 0xF3): 72·br/sr + pad; 576 samples. */
  private def frameV2L3(brIdx: Int, srIdx: Int): Array[Byte] = {
    val br = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
      144, 160)(brIdx) * 1000
    val sr = Array(22050, 24000, 16000)(srIdx)
    val b = new Array[Byte](72 * br / sr)
    b(0) = 0xff.toByte
    b(1) = 0xf3.toByte
    b(2) = ((brIdx << 4) | (srIdx << 2)).toByte
    b
  }

  /** MPEG1 Layer I (0xFF 0xFF): (12·br/sr + pad)·4; 384 samples. */
  private def frameV1L1(brIdx: Int): Array[Byte] = {
    val br = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320,
      352, 384, 416, 448)(brIdx) * 1000
    val b = new Array[Byte]((12 * br / 44100) * 4)
    b(0) = 0xff.toByte
    b(1) = 0xff.toByte
    b(2) = ((brIdx << 4) | 0).toByte
    b
  }

  /** ID3v2.3 tag: plain 32-bit frame sizes, zero padding. */
  private def id3v23(frames: Seq[(String, Int)], padding: Int)
      : Array[Byte] = {
    val body = frames.flatMap { case (id, sz) =>
      id.getBytes("US-ASCII").toSeq ++
        Seq((sz >> 24).toByte, (sz >> 16).toByte, (sz >> 8).toByte,
          sz.toByte, 0.toByte, 0.toByte) ++ Seq.fill(sz)(0.toByte)
    } ++ Seq.fill(padding)(0.toByte)
    val sz = body.length
    ("ID3".getBytes("US-ASCII").toSeq ++
      Seq(3.toByte, 0.toByte, 0.toByte,
        ((sz >> 21) & 0x7f).toByte, ((sz >> 14) & 0x7f).toByte,
        ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte) ++ body).toArray
  }

  /** ID3v2.4 tag: syncsafe frame sizes. */
  private def id3v24(frames: Seq[(String, Int)]): Array[Byte] = {
    val body = frames.flatMap { case (id, sz) =>
      id.getBytes("US-ASCII").toSeq ++
        Seq(((sz >> 21) & 0x7f).toByte, ((sz >> 14) & 0x7f).toByte,
          ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte,
          0.toByte, 0.toByte) ++ Seq.fill(sz)(0.toByte)
    }
    val sz = body.length
    ("ID3".getBytes("US-ASCII").toSeq ++
      Seq(4.toByte, 0.toByte, 0.toByte,
        ((sz >> 21) & 0x7f).toByte, ((sz >> 14) & 0x7f).toByte,
        ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte) ++ body).toArray
  }

  private def id3v1: Array[Byte] = {
    val b = new Array[Byte](128)
    b(0) = 'T'; b(1) = 'A'; b(2) = 'G'
    b
  }

  test("tagged CBR stream: tag census + frame tiling + exact samples") {
    val f = id3v23(Seq("TIT2" -> 5, "TALB" -> 3), padding = 10) ++
      frameV1L3(9, 0, 0) ++ frameV1L3(9, 0, 1) ++ frameV1L3(9, 0, 0) ++
      id3v1
    val m = Mp3Container.parse(f).get
    assert(m.id3v2Major == 3 && m.nId3Frames == 2)
    // frames: (4 id + 4 sz + 2 flags) + payload → 15 and 13 bytes
    assert(m.id3Bytes == 10L + 15 + 13 + 10,
      "tag bytes = header + frames + padding")
    assert(m.nMpegFrames == 3 && m.sampleRate == 44100)
    assert(m.nBitrates == 1, "single bitrate = CBR")
    assert(m.totalSamples == 3 * 1152L)
    assert(m.audioBytes == 417L + 418L + 417L,
      "144·128000/44100 = 417 (+1 padded)")
    assert(m.hasId3v1)
  }

  test("VBR detection, MPEG2 half-rate samples, v2.4 syncsafe tag") {
    val f = id3v24(Seq("TPE1" -> 4)) ++
      frameV2L3(4, 1) ++ frameV2L3(8, 1) ++ frameV2L3(4, 1)
    val m = Mp3Container.parse(f).get
    assert(m.id3v2Major == 4 && m.nId3Frames == 1)
    assert(m.nBitrates == 2, "two distinct bitrates = VBR")
    assert(m.sampleRate == 24000)
    assert(m.totalSamples == 3 * 576L, "MPEG2 Layer III = 576/frame")
  }

  test("Layer I frames and a tag-only file are both valid") {
    val m1 = Mp3Container.parse(
      frameV1L1(4) ++ frameV1L1(4)).get
    assert(m1.nMpegFrames == 2 && m1.totalSamples == 2 * 384L)
    assert(m1.audioBytes == 2L * (12 * 128000 / 44100) * 4)
    val m2 = Mp3Container.parse(id3v23(Seq("TXXX" -> 2), 0)).get
    assert(m2.nMpegFrames == 0 && m2.nId3Frames == 1 && !m2.hasId3v1)
  }

  test("malformed inputs return None, never throw") {
    val good = frameV1L3(9, 0, 0)
    val cases: Seq[Array[Byte]] = Seq(
      Array[Byte](),
      "garbage".getBytes("US-ASCII"),
      good.take(100),                         // truncated frame
      good ++ Array[Byte](1, 2, 3),           // trailing junk
      { val b = good.clone(); b(1) = 0xf9.toByte; b }, // layer 00
      { val b = good.clone(); b(2) = 0xf0.toByte; b }, // brIdx 15
      { val b = good.clone(); b(2) = 0x00.toByte; b }, // free bitrate
      { val b = good.clone(); b(2) = 0x9c.toByte; b }, // srIdx 3
      // id3 size byte with the syncsafe high bit set
      { val t = id3v23(Seq("TIT2" -> 1), 0); t(6) = 0x80.toByte; t },
      // bad frame id (lowercase) inside the tag
      { val t = id3v23(Seq("xIT2" -> 1), 0); t },
      // nonzero byte inside the padding run
      { val t = id3v23(Seq("TIT2" -> 1), 4)
        t(t.length - 1) = 9.toByte; t })
    cases.foreach(c => assert(Mp3Container.parse(c).isEmpty,
      s"case of ${c.length} bytes must be rejected"))
  }

  test("withMp3Meta over a media frame: typed census, null on junk") {
    val rows = Seq(
      (1L, id3v23(Seq("TIT2" -> 5), 2) ++ frameV1L3(9, 0, 0)),
      (2L, "junk".getBytes("US-ASCII")))
    val df = rows.toDF("media_id", "payload")
    val out = Mp3Container.withMp3Meta(df)
      .select("media_id", "n_mpeg_frames", "sample_rate", "has_id3v1")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L)._1.contains(1) && out(1L)._2.contains(44100))
    assert(out(2L)._1.isEmpty && out(2L)._2.isEmpty)
  }
}

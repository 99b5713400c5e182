package graft

import java.nio.ByteBuffer

import graft.operators.AudioFlac

/** FLAC STREAMINFO + block-chain walk: exact bit unpacking, block
  * census, and the bad-byte tolerance discipline (None, never a
  * throw). Fixtures are hand-assembled per RFC 9639. */
class AudioFlacSpec extends SparkSpec {
  import spark.implicits._

  /** METADATA_BLOCK: flag/type byte + 24-bit length + body. */
  private def block(typ: Int, last: Boolean, body: Array[Byte]): Array[Byte] = {
    val h = Array[Byte](
      ((if (last) 0x80 else 0) | typ).toByte,
      ((body.length >> 16) & 0xff).toByte,
      ((body.length >> 8) & 0xff).toByte,
      (body.length & 0xff).toByte)
    h ++ body
  }

  /** STREAMINFO body: rate in Hz, channels, bits-per-sample, total
    * samples, packed exactly as the spec's bitfields. */
  private def streamInfo(rate: Long, ch: Int, bps: Int,
                         samples: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(34)
    b.putShort(4096.toShort).putShort(4096.toShort) // min/max block
    b.put(Array[Byte](0, 0, 0, 0, 0, 0)) // min/max frame (24+24 bits)
    b.put((rate >> 12).toByte)
    b.put(((rate >> 4) & 0xff).toByte)
    b.put((((rate & 0xf) << 4) | ((ch - 1) << 1) |
      ((bps - 1) >> 4)).toByte)
    b.put(((((bps - 1) & 0xf) << 4) | ((samples >> 32) & 0xf)).toByte)
    b.putInt((samples & 0xffffffffL).toInt)
    b.put(new Array[Byte](16)) // md5
    b.array()
  }

  private val magic = "fLaC".getBytes("US-ASCII")

  test("STREAMINFO bitfields unpack exactly") {
    val f = magic ++ block(0, last = true,
      streamInfo(44100L, 2, 16, 441000L))
    val m = AudioFlac.parse(f).get
    assert(m.sampleRateHz == 44100L && m.channels == 2 &&
      m.bitsPerSample == 16 && m.totalSamples == 441000L)
    assert(m.durationMs == 10000L, "441000 samples at 44.1 kHz = 10 s")
    assert(m.nBlocks == 1 && !m.hasSeektable && m.nPictures == 0)
  }

  test("odd rates and wide samples survive the bit packing") {
    // 20-bit rate ceiling and a >32-bit sample count exercise every
    // boundary in the 64-bit assembly
    val f = magic ++ block(0, last = true,
      streamInfo(655350L, 8, 32, (1L << 35) + 7L))
    val m = AudioFlac.parse(f).get
    assert(m.sampleRateHz == 655350L && m.channels == 8 &&
      m.bitsPerSample == 32 && m.totalSamples == (1L << 35) + 7L)
  }

  test("block chain census: seektable, vorbis comment, pictures") {
    val f = magic ++
      block(0, last = false, streamInfo(48000L, 1, 24, 48000L)) ++
      block(3, last = false, new Array[Byte](18)) ++
      block(4, last = false, Array[Byte](1, 2, 3)) ++
      block(6, last = false, new Array[Byte](8)) ++
      block(6, last = true, new Array[Byte](8))
    val m = AudioFlac.parse(f).get
    assert(m.nBlocks == 5 && m.hasSeektable && m.hasVorbisComment &&
      m.nPictures == 2)
  }

  test("malformed payloads yield None, never a throw") {
    val good = magic ++ block(0, last = true,
      streamInfo(8000L, 1, 8, 800L))
    assert(AudioFlac.parse(good).isDefined)
    assert(AudioFlac.parse(null).isEmpty, "null payload")
    assert(AudioFlac.parse("OggS1234".getBytes).isEmpty, "wrong magic")
    assert(AudioFlac.parse(good.dropRight(3)).isEmpty,
      "truncated final block")
    assert(AudioFlac.parse(magic ++ block(1, last = true,
      new Array[Byte](4))).isEmpty, "no STREAMINFO")
    assert(AudioFlac.parse(magic ++ block(0, last = true,
      streamInfo(0L, 1, 8, 1L))).isEmpty, "zero sample rate")
    assert(AudioFlac.parse(magic ++ block(0, last = true,
      new Array[Byte](20))).isEmpty, "mis-sized STREAMINFO")
    assert(AudioFlac.parse(magic ++ block(127, last = true,
      new Array[Byte](1))).isEmpty, "forbidden block type")
    // RFC 9639 §8.1: STREAMINFO MUST be the first block — a stream
    // with padding first then a valid STREAMINFO is malformed
    assert(AudioFlac.parse(magic ++
      block(1, last = false, new Array[Byte](4)) ++
      block(0, last = true, streamInfo(8000L, 1, 8, 800L))).isEmpty,
      "misplaced STREAMINFO (not first block)")
    // random junk fuzz: absence of throws is the assertion
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 3, 8, 64, 512)) {
      val junk = new Array[Byte](n); rnd.nextBytes(junk)
      AudioFlac.parse(magic ++ junk)
      AudioFlac.parse(junk)
    }
  }

  test("withFlacMeta: columns land; non-FLAC rows null; no exchange") {
    val good = magic ++ block(0, last = true,
      streamInfo(44100L, 2, 16, 44100L))
    val df = AudioFlac.withFlacMeta(
      Seq((1L, good), (2L, "not flac".getBytes),
        (3L, null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "payload"))
    val m = df.collect().map(r => r.getLong(0) -> r).toMap
    // columns: media_id(0), payload(1), sample_rate_hz(2), channels(3),
    // bits_per_sample(4), total_samples(5), duration_ms(6), ...
    assert(m(1L).getLong(2) == 44100L && m(1L).getLong(6) == 1000L,
      "rate + duration_ms")
    assert(m(2L).isNullAt(2) && m(3L).isNullAt(2))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"narrow pass must not shuffle:\n$p")
  }
}

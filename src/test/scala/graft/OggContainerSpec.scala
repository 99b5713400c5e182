package graft

import java.nio.{ByteBuffer, ByteOrder}

import graft.operators.OggContainer

/** Ogg page walk: exact LE field decoding, multiplexed-stream census,
  * sequence-gap detection, and the never-throw malformed contract —
  * the AudioFlacSpec discipline on RFC 3533 fixtures. */
class OggContainerSpec extends SparkSpec {
  import spark.implicits._

  /** One page: header + lacing + body (body bytes are zeros; the walk
    * never reads them). Splits body into 255-byte lacing values plus
    * the remainder, exactly the spec's encoding. */
  private def page(serial: Long, seq: Long, granule: Long,
                   bodyLen: Int, flags: Int = 0): Array[Byte] = {
    val full = bodyLen / 255
    val rem = bodyLen % 255
    val nSegs = full + 1 // remainder segment always present (may be 0)
    val buf = ByteBuffer.allocate(27 + nSegs + bodyLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("OggS".getBytes("US-ASCII"))
    buf.put(0.toByte).put(flags.toByte)
    buf.putLong(granule)
    buf.putInt(serial.toInt).putInt(seq.toInt)
    buf.putInt(0) // CRC (not verified by the census walk)
    buf.put(nSegs.toByte)
    for (_ <- 0 until full) buf.put(255.toByte)
    buf.put(rem.toByte)
    buf.put(new Array[Byte](bodyLen))
    buf.array()
  }

  test("single-stream chain: pages, BOS/EOS, granule max, body bytes") {
    val f = page(7L, 0L, -1L, 30, flags = 0x02) ++
      page(7L, 1L, 4800L, 300) ++
      page(7L, 2L, 9600L, 258, flags = 0x04)
    val m = OggContainer.parse(f).get
    assert(m.nPages == 3 && m.nStreams == 1)
    assert(m.nBos == 1 && m.nEos == 1 && m.nContinued == 0)
    assert(m.seqGaps == 0)
    assert(m.granuleMax == 9600L, "-1 sentinel must not win the max")
    assert(m.bodyBytes == 30L + 300L + 258L)
  }

  test("multiplexed streams interleave; per-serial sequence gaps") {
    val f = page(1L, 0L, -1L, 10, flags = 0x02) ++
      page(2L, 0L, -1L, 10, flags = 0x02) ++
      page(1L, 1L, 100L, 20) ++
      page(2L, 3L, 200L, 20) ++ // serial 2 jumps 0 -> 3: one gap
      page(1L, 2L, 300L, 20, flags = 0x04) ++
      page(2L, 4L, 400L, 20, flags = 0x04)
    val m = OggContainer.parse(f).get
    assert(m.nPages == 6 && m.nStreams == 2)
    assert(m.nBos == 2 && m.nEos == 2)
    assert(m.seqGaps == 1, "only serial 2's 0->3 jump is a gap")
    assert(m.granuleMax == 400L)
  }

  test("255-boundary lacing: a 510-byte body uses 255+255+0 segments") {
    val m = OggContainer.parse(page(5L, 0L, 0L, 510, flags = 0x02)).get
    assert(m.nPages == 1 && m.bodyBytes == 510L)
  }

  test("continued-packet flag censused") {
    val f = page(9L, 0L, -1L, 255, flags = 0x02) ++
      page(9L, 1L, 50L, 40, flags = 0x01)
    val m = OggContainer.parse(f).get
    assert(m.nContinued == 1)
  }

  test("malformed payloads yield None, never a throw") {
    val good = page(3L, 0L, 7L, 12, flags = 0x02)
    assert(OggContainer.parse(good).isDefined)
    assert(OggContainer.parse(null).isEmpty, "null payload")
    assert(OggContainer.parse(Array.empty[Byte]).isEmpty, "empty")
    assert(OggContainer.parse("fLaC0000".getBytes).isEmpty, "wrong magic")
    assert(OggContainer.parse(good.dropRight(3)).isEmpty,
      "truncated body")
    assert(OggContainer.parse(good.take(20)).isEmpty,
      "truncated header")
    assert(OggContainer.parse(good ++ "junk".getBytes).isEmpty,
      "trailing junk after the last page")
    val badVer = good.clone(); badVer(4) = 1
    assert(OggContainer.parse(badVer).isEmpty, "nonzero version")
    val badFlags = good.clone(); badFlags(5) = 0x12
    assert(OggContainer.parse(badFlags).isEmpty, "reserved flag bits")
    val badLace = good.clone(); badLace(27) = 99 // lacing > remaining
    assert(OggContainer.parse(badLace).isEmpty, "lacing overruns buffer")
    // random junk fuzz: absence of throws is the assertion
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 5, 28, 64, 512)) {
      val junk = new Array[Byte](n); rnd.nextBytes(junk)
      OggContainer.parse(junk)
      OggContainer.parse("OggS".getBytes ++ junk)
    }
  }

  test("withOggMeta: columns land; non-Ogg rows null") {
    val good = page(3L, 0L, 7L, 12, flags = 0x02) ++
      page(3L, 1L, 99L, 5, flags = 0x04)
    val df = OggContainer.withOggMeta(
      Seq((1L, good), (2L, "not ogg".getBytes),
        (3L, null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "payload"))
    val m = df.collect().map(r => r.getLong(0) -> r).toMap
    // media_id(0), payload(1), n_pages(2), n_streams(3), n_bos(4),
    // n_eos(5), n_continued(6), seq_gaps(7), granule_max(8), body_bytes(9)
    assert(m(1L).getInt(2) == 2 && m(1L).getInt(3) == 1)
    assert(m(1L).getLong(8) == 99L && m(1L).getLong(9) == 17L)
    assert(m(2L).isNullAt(2) && m(3L).isNullAt(2))
  }
}

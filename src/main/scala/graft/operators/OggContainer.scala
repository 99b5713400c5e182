package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ogg container page walk — the free-codec leg of the container
  * family next to [[AudioWav]]/[[AudioFlac]] (audio) and
  * VideoContainer (MP4/MKV/fMP4): the physical bitstream is a
  * sequence of "OggS" pages (RFC 3533 §6) — 27-byte header (version
  * 0, header-type flags, 64-bit LE granule position, 32-bit LE
  * serial, 32-bit LE page sequence number, CRC, segment count) plus
  * the lacing table whose byte sum is the page body length. The walk
  * censuses what a data pipeline triages multiplexed media by:
  * logical streams (distinct serials), BOS/EOS balance (truncated
  * capture detection), per-stream sequence GAPS (packet loss), the
  * granule extremes (duration proxy, codec-agnostic), and body bytes.
  * Pure integer parsing; packet decode stays behind
  * [[Multimodal.Codec]] like every other container.
  *
  * Tolerance discipline (the log sources' rule): ANY malformed byte —
  * bad capture pattern, nonzero version, truncated header/lacing/
  * body, trailing junk after the last page — yields None
  * (valid=false, null census), never a throw. Narrow per-partition
  * pass; payloads never shuffle.
  *
  * Cf. the reference's whole-file checksum treatment of binary
  * payloads (lib/maillogsentinel/sql_importer.py:96-120) — typed
  * metadata instead of an opaque hash.
  */
object OggContainer {

  /** Page-chain census. `granuleMax` ignores -1 sentinels ("no packet
    * finishes on this page" per spec) and is 0 when no page carries a
    * real granule; `seqGaps` counts per-serial non-consecutive page
    * sequence numbers (first page of a serial exempt). */
  final case class OggMeta(
      nPages: Int,
      nStreams: Int,
      nBos: Int,
      nEos: Int,
      nContinued: Int,
      seqGaps: Int,
      granuleMax: Long,
      bodyBytes: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)
  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)

  /** Strict walk; None on any malformed byte. */
  def parse(b: Array[Byte]): Option[OggMeta] = {
    if (b == null || b.length < 28) return None
    var i = 0
    var nPages = 0
    var nBos, nEos, nCont, gaps = 0
    var granuleMax = 0L
    var bodyBytes = 0L
    val lastSeq = scala.collection.mutable.Map.empty[Long, Long]
    while (i < b.length) {
      if (i + 27 > b.length) return None
      if (!(b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' &&
            b(i + 3) == 'S')) return None
      if (b(i + 4) != 0) return None // stream_structure_version
      val flags = u8(b, i + 5)
      if ((flags & 0xf8) != 0) return None // reserved bits must be 0
      val granule = le64(b, i + 6)
      val serial = le32(b, i + 14)
      val seq = le32(b, i + 18)
      val nSegs = u8(b, i + 26)
      if (i + 27 + nSegs > b.length) return None
      var body = 0
      var k = 0
      while (k < nSegs) { body += u8(b, i + 27 + k); k += 1 }
      if (i + 27 + nSegs + body > b.length) return None
      if ((flags & 0x01) != 0) nCont += 1
      if ((flags & 0x02) != 0) nBos += 1
      if ((flags & 0x04) != 0) nEos += 1
      if (granule != -1L && granule > granuleMax) granuleMax = granule
      lastSeq.get(serial) match {
        case Some(prev) if seq != prev + 1 => gaps += 1
        case _ => ()
      }
      lastSeq(serial) = seq
      bodyBytes += body
      nPages += 1
      i += 27 + nSegs + body
    }
    if (nPages == 0) None
    else Some(OggMeta(nPages, lastSeq.size, nBos, nEos, nCont, gaps,
      granuleMax, bodyBytes))
  }

  /** Adds the census columns (nulls when the payload is not a valid
    * Ogg stream) — narrow per-partition pass. */
  def withOggMeta(media: DataFrame): DataFrame = {
    val p = udf { payload: Array[Byte] =>
      parse(payload).map(m => (m.nPages, m.nStreams, m.nBos, m.nEos,
        m.nContinued, m.seqGaps, m.granuleMax, m.bodyBytes))
    }
    media.withColumn("_og", p(col("payload")))
      .withColumn("n_pages", col("_og._1"))
      .withColumn("n_streams", col("_og._2"))
      .withColumn("n_bos", col("_og._3"))
      .withColumn("n_eos", col("_og._4"))
      .withColumn("n_continued", col("_og._5"))
      .withColumn("seq_gaps", col("_og._6"))
      .withColumn("granule_max", col("_og._7"))
      .withColumn("body_bytes", col("_og._8"))
      .drop("_og")
  }
}

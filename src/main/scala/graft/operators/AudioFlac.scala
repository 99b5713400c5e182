package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FLAC container metadata walk — the lossless leg of the audio
  * modality next to [[AudioWav]] (RIFF/PCM): "fLaC" magic, then the
  * METADATA_BLOCK chain (1 flag/type byte + 24-bit big-endian length
  * each) with the bit-packed STREAMINFO block (type 0, 34 bytes)
  * decoded exactly per the public spec (RFC 9639 §8.2): block sizes,
  * 20-bit sample rate, 3-bit channels−1, 5-bit bps−1, 36-bit total
  * samples. Pure integer parsing, no codec — like WAV/MP4/MKV nothing
  * is stubbed; FRAME audio decode stays behind [[Multimodal.Codec]].
  *
  * Tolerance discipline (the log sources' rule): ANY malformed byte —
  * bad magic, truncated block, zero sample rate, STREAMINFO missing
  * or mis-sized — yields None (valid=false, null census), never a
  * throw. The walk is a narrow per-partition pass; payloads never
  * shuffle ([[Multimodal.withParsedDims]] discipline).
  *
  * Cf. the reference's whole-file checksum treatment of binary
  * payloads (lib/maillogsentinel/sql_importer.py:96-120) — typed
  * metadata instead of an opaque hash.
  */
object AudioFlac {

  /** Parsed STREAMINFO + block-chain census. `durationMs` =
    * totalSamples·1000 / sampleRateHz (0 when totalSamples is 0 —
    * "unknown" per spec). */
  final case class FlacMeta(
      sampleRateHz: Long,
      channels: Int,
      bitsPerSample: Int,
      totalSamples: Long,
      durationMs: Long,
      nBlocks: Int,
      hasSeektable: Boolean,
      hasVorbisComment: Boolean,
      nPictures: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be24(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 16) | (u8(b, i + 1) << 8) | u8(b, i + 2)

  /** Strict walk; None on any malformed byte. */
  def parse(b: Array[Byte]): Option[FlacMeta] = {
    if (b == null || b.length < 4 + 4 + 34) return None
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'))
      return None
    var i = 4
    var streamInfo: Option[Int] = None // body offset
    var nBlocks = 0
    var seek = false
    var vorbis = false
    var pics = 0
    var last = false
    while (!last) {
      if (i + 4 > b.length) return None
      val flagType = u8(b, i)
      last = (flagType & 0x80) != 0
      val typ = flagType & 0x7f
      val len = be24(b, i + 1)
      val body = i + 4
      if (body + len > b.length) return None
      if (typ == 127) return None // forbidden per spec
      // RFC 9639 §8.1: STREAMINFO MUST be the first metadata block —
      // a stream whose first block is anything else is malformed
      if (i == 4 && typ != 0) return None
      typ match {
        case 0 =>
          if (len != 34 || streamInfo.isDefined) return None
          streamInfo = Some(body)
        case 3 => seek = true
        case 4 => vorbis = true
        case 6 => pics += 1
        case _ => ()
      }
      nBlocks += 1
      i = body + len
    }
    streamInfo.map { s =>
      // bytes 10..17: rate(20) | channels-1(3) | bps-1(5) | samples(36)
      val rate = (u8(b, s + 10).toLong << 12) |
        (u8(b, s + 11).toLong << 4) | (u8(b, s + 12) >> 4)
      val channels = ((u8(b, s + 12) >> 1) & 0x7) + 1
      val bps = (((u8(b, s + 12) & 0x1) << 4) | (u8(b, s + 13) >> 4)) + 1
      val samples = ((u8(b, s + 13) & 0x0f).toLong << 32) |
        (u8(b, s + 14).toLong << 24) | (u8(b, s + 15).toLong << 16) |
        (u8(b, s + 16).toLong << 8) | u8(b, s + 17).toLong
      (rate, channels, bps, samples)
    }.filter(_._1 > 0) // rate 0 is invalid per spec
      .map { case (rate, ch, bps, samples) =>
        FlacMeta(rate, ch, bps, samples, samples * 1000L / rate,
          nBlocks, seek, vorbis, pics)
      }
  }

  /** Adds the census columns (nulls when the payload is not a valid
    * FLAC stream) — narrow per-partition pass. */
  def withFlacMeta(media: DataFrame): DataFrame = {
    val p = udf { payload: Array[Byte] =>
      parse(payload).map(m => (m.sampleRateHz, m.channels,
        m.bitsPerSample, m.totalSamples, m.durationMs, m.nBlocks,
        m.hasSeektable, m.hasVorbisComment, m.nPictures))
    }
    media.withColumn("_fl", p(col("payload")))
      .withColumn("sample_rate_hz", col("_fl._1"))
      .withColumn("channels", col("_fl._2"))
      .withColumn("bits_per_sample", col("_fl._3"))
      .withColumn("total_samples", col("_fl._4"))
      .withColumn("duration_ms", col("_fl._5"))
      .withColumn("n_meta_blocks", col("_fl._6"))
      .withColumn("has_seektable", col("_fl._7"))
      .withColumn("has_vorbis_comment", col("_fl._8"))
      .withColumn("n_pictures", col("_fl._9"))
      .drop("_fl")
  }
}

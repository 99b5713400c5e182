package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MP3 container walk — the last common audio container next to
  * [[AudioWav]]/[[AudioFlac]]/[[OggContainer]]: an optional ID3v2 tag
  * (id3.org ID3v2.2/2.3/2.4 informal standards — "ID3" magic,
  * version, flags, 28-bit syncsafe size, then tagged frames and zero
  * padding), a run of MPEG audio frames (ISO/IEC 11172-3 §2.4 header:
  * 11-bit sync, version/layer/bitrate/samplerate indices, padding
  * bit; frame length derived from the public bitrate and sample-rate
  * tables), and an optional 128-byte ID3v1 "TAG" trailer. The census
  * carries what a training-data pipeline triages audio by WITHOUT
  * decoding: tag surface (version, frame count, tag bytes), stream
  * shape (frame count, sample rate, CBR-vs-VBR via distinct bitrate
  * count), and the exact PCM duration proxy (Σ samples-per-frame —
  * 384/1152 per layer, halved for MPEG2/2.5 Layer III — over the
  * sample rate). Decode stays behind [[Multimodal.Codec]] like every
  * container.
  *
  * Tolerance discipline (the log sources' rule): ANY malformed byte —
  * bad magic, reserved version/layer/bitrate/samplerate index, free-
  * format bitrate (length indeterminate), truncated tag or frame,
  * trailing junk the walk cannot tile — yields None (valid=false,
  * null census), never a throw. Narrow per-partition pass; payloads
  * never shuffle.
  *
  * Cf. the reference's whole-file checksum treatment of binary
  * payloads (lib/maillogsentinel/sql_importer.py:96-120) — typed
  * metadata instead of an opaque hash.
  */
object Mp3Container {

  /** Stream census. `id3v2Major` is 0 when no ID3v2 tag leads the
    * file; `nBitrates` > 1 flags VBR; `totalSamples / sampleRate` is
    * the duration in seconds. */
  final case class Mp3Meta(
      id3v2Major: Int,
      nId3Frames: Int,
      id3Bytes: Long,
      nMpegFrames: Int,
      sampleRate: Int,
      nBitrates: Int,
      totalSamples: Long,
      audioBytes: Long,
      hasId3v1: Boolean)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** 28-bit syncsafe integer (4 × 7 bits, high bit of each byte must
    * be clear); -1 on a set high bit. */
  private def syncsafe(b: Array[Byte], i: Int): Int = {
    var v = 0
    var k = 0
    while (k < 4) {
      val x = u8(b, i + k)
      if ((x & 0x80) != 0) return -1
      v = (v << 7) | x
      k += 1
    }
    v
  }

  // public bitrate tables, kbps; index 0 = free format (rejected:
  // frame length indeterminate), 15 = bad
  private val brV1L1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val brV1L2 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val brV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val brV2L1 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val brV2L23 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val srV1 = Array(44100, 48000, 32000)
  private val srV2 = Array(22050, 24000, 16000)
  private val srV25 = Array(11025, 12000, 8000)

  /** Walks the ID3v2 frame list; returns (frameCount, ok). v2.2 uses
    * 3-byte ids/sizes; v2.3 plain 32-bit sizes; v2.4 syncsafe. Zero
    * padding after the last frame is legal (v2.4 §3.0). */
  private def walkId3Frames(b: Array[Byte], start: Int, end: Int,
                            major: Int): (Int, Boolean) = {
    var i = start
    var n = 0
    val (idLen, szLen, flagLen) =
      if (major == 2) (3, 3, 0) else (4, 4, 2)
    while (i < end) {
      if (u8(b, i) == 0) {
        // padding must be zeros to the tag end
        var k = i
        while (k < end) {
          if (u8(b, k) != 0) return (n, false)
          k += 1
        }
        return (n, true)
      }
      if (i + idLen + szLen + flagLen > end) return (n, false)
      // frame ids are A-Z0-9 (id3v2.4 §4)
      var k = 0
      while (k < idLen) {
        val c = u8(b, i + k)
        if (!((c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
          return (n, false)
        k += 1
      }
      val sz =
        if (major == 2)
          (u8(b, i + 3) << 16) | (u8(b, i + 4) << 8) | u8(b, i + 5)
        else if (major == 3)
          (u8(b, i + 4) << 24) | (u8(b, i + 5) << 16) |
            (u8(b, i + 6) << 8) | u8(b, i + 7)
        else syncsafe(b, i + idLen)
      if (sz < 0) return (n, false)
      i += idLen + szLen + flagLen + sz
      if (i > end) return (n, false)
      n += 1
    }
    (n, true)
  }

  /** Strict walk; None on any malformed byte. */
  def parse(b: Array[Byte]): Option[Mp3Meta] = {
    if (b == null || b.length < 4) return None
    var i = 0
    var id3Major = 0
    var nId3 = 0
    var id3Bytes = 0L

    // optional leading ID3v2 tag
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val major = u8(b, 3)
      if (major < 2 || major > 4 || u8(b, 4) == 0xff) return None
      val flags = u8(b, 5)
      // v2.2: only bits 7-6 defined; v2.3: 7-5; v2.4: 7-4
      val legal = if (major == 2) 0xc0 else if (major == 3) 0xe0 else 0xf0
      if ((flags & ~legal) != 0) return None
      val sz = syncsafe(b, 6)
      if (sz < 0) return None
      val footer = major == 4 && (flags & 0x10) != 0
      val total = 10 + sz + (if (footer) 10 else 0)
      if (total > b.length) return None
      // unsynchronised or extended-header tags: skip frame-level walk
      // (the byte stream is escaped); count stays 0, size is real
      if ((flags & 0xc0) == 0) {
        val (n, ok) = walkId3Frames(b, 10, 10 + sz, major)
        if (!ok) return None
        nId3 = n
      }
      if (footer &&
        !(b(10 + sz) == '3' && b(10 + sz + 1) == 'D' &&
          b(10 + sz + 2) == 'I')) return None
      id3Major = major
      id3Bytes = total.toLong
      i = total
    }

    // optional trailing ID3v1 tag
    var end = b.length
    var id3v1 = false
    if (end - i >= 128 && b(end - 128) == 'T' && b(end - 127) == 'A' &&
      b(end - 126) == 'G') {
      id3v1 = true
      end -= 128
    }

    // MPEG frame run must tile [i, end) exactly
    var nFrames = 0
    var sampleRate = -1
    var totalSamples = 0L
    var audioBytes = 0L
    val bitrates = scala.collection.mutable.Set.empty[Int]
    while (i < end) {
      if (i + 4 > end) return None
      if (u8(b, i) != 0xff || (u8(b, i + 1) & 0xe0) != 0xe0) return None
      val verId = (u8(b, i + 1) >> 3) & 0x3   // 0=2.5, 1=res, 2=v2, 3=v1
      val layer = (u8(b, i + 1) >> 1) & 0x3   // 1=III, 2=II, 3=I
      if (verId == 1 || layer == 0) return None
      val brIdx = (u8(b, i + 2) >> 4) & 0xf
      val srIdx = (u8(b, i + 2) >> 2) & 0x3
      val pad = (u8(b, i + 2) >> 1) & 0x1
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val v1 = verId == 3
      val br = 1000 * (layer match {
        case 3 => if (v1) brV1L1(brIdx) else brV2L1(brIdx)
        case 2 => if (v1) brV1L2(brIdx) else brV2L23(brIdx)
        case _ => if (v1) brV1L3(brIdx) else brV2L23(brIdx)
      })
      val sr = verId match {
        case 3 => srV1(srIdx)
        case 2 => srV2(srIdx)
        case _ => srV25(srIdx)
      }
      if (sampleRate == -1) sampleRate = sr
      else if (sampleRate != sr) return None // mid-stream rate switch
      val len = layer match {
        case 3 => (12 * br / sr + pad) * 4           // Layer I
        case _ =>
          val spf = if (layer == 2 || v1) 144 else 72
          spf * br / sr + pad                        // Layer II/III
      }
      if (len < 4 || i + len > end) return None
      val samples = layer match {
        case 3 => 384L
        case 2 => 1152L
        case _ => if (v1) 1152L else 576L
      }
      bitrates += br
      totalSamples += samples
      audioBytes += len
      nFrames += 1
      i += len
    }
    if (nFrames == 0 && id3Major == 0) return None
    Some(Mp3Meta(id3Major, nId3, id3Bytes, nFrames,
      if (sampleRate == -1) 0 else sampleRate, bitrates.size,
      totalSamples, audioBytes, id3v1))
  }

  /** Adds the census columns (nulls when the payload is not a valid
    * MP3 stream) — narrow per-partition pass. */
  def withMp3Meta(media: DataFrame): DataFrame = {
    val p = udf { payload: Array[Byte] =>
      parse(payload).map(m => (m.id3v2Major, m.nId3Frames, m.id3Bytes,
        m.nMpegFrames, m.sampleRate, m.nBitrates, m.totalSamples,
        m.audioBytes, m.hasId3v1))
    }
    media.withColumn("_m3", p(col("payload")))
      .withColumn("id3v2_major", col("_m3._1"))
      .withColumn("n_id3_frames", col("_m3._2"))
      .withColumn("id3_bytes", col("_m3._3"))
      .withColumn("n_mpeg_frames", col("_m3._4"))
      .withColumn("sample_rate", col("_m3._5"))
      .withColumn("n_bitrates", col("_m3._6"))
      .withColumn("total_samples", col("_m3._7"))
      .withColumn("audio_bytes", col("_m3._8"))
      .withColumn("has_id3v1", col("_m3._9"))
      .drop("_m3")
  }
}

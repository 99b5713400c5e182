package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL audio decode leg for the multimodal suite: RIFF/WAVE PCM16
  * parsing and an energy-delta fingerprint, pure JVM integer math —
  * WAV needs no codec library, so unlike the JPEG/PNG leg there is
  * nothing to stub: header walk, sample decode, channel mixdown and
  * the fingerprint are all total, deterministic functions (derived
  * from the public RIFF/WAVE format spec, like ImageHeaders from the
  * PNG/GIF/BMP specs).
  *
  * The fingerprint is the classic energy-delta signature (the
  * simplified Shazam/Chromaprint idea): frame the mono signal, take
  * per-frame total magnitude, set bit i iff energy rises from frame i
  * to i+1. Amplitude-invariant by construction (scaling every sample
  * preserves every energy ordering, up to truncation ties) and robust
  * to small local edits — the audio analogue of [[Multimodal.aHash64]],
  * reusing its 4×16-bit band-join economics for near-dup pairs.
  *
  * Cf. the reference's whole-file content checksum dedup
  * (maillogsentinel/sql_importer.py) — this is the perceptual
  * sub-file generalization for audio payloads.
  */
object AudioWav {

  /** Decoded PCM: interleaved 16-bit samples + format. */
  final case class Pcm(samples: Array[Short], sampleRate: Int, channels: Int)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Strict RIFF/WAVE chunk walk; PCM16 only. None on ANY malformed
    * byte — truncated header, non-PCM format, chunk running past the
    * buffer — the same bad-byte tolerance discipline as the log
    * sources (tolerate, never throw). Chunks after `data` are allowed
    * (LIST/INFO tails are common); odd-sized chunks consume their RIFF
    * pad byte. */
  def decodePcm16(b: Array[Byte]): Option[Pcm] = {
    if (b.length < 44) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F') return None
    if (b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var rate = 0
    var channels = 0
    var fmtOk = false
    while (i + 8 <= b.length) {
      val id = new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
        java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, i + 4)
      val body = i + 8
      if (size < 0 || body + size > b.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        val audioFormat = le16(b, body)
        channels = le16(b, body + 2)
        rate = le32(b, body + 4).toInt
        val bits = le16(b, body + 14)
        if (audioFormat != 1 || bits != 16 || channels < 1 || rate <= 0)
          return None
        fmtOk = true
      } else if (id == "data") {
        if (!fmtOk) return None
        val n = (size / 2).toInt
        val out = new Array[Short](n)
        var k = 0
        while (k < n) {
          out(k) = le16(b, body + k * 2).toShort
          k += 1
        }
        return Some(Pcm(out, rate, channels))
      }
      i = body + size.toInt + (size.toInt & 1) // RIFF pads odd chunks
    }
    None
  }

  /** Canonical 44-byte-header PCM16 writer (the fixture/export side of
    * [[decodePcm16]] — round-trip parity is spec-pinned). */
  def writePcm16Wav(samples: Array[Short], sampleRate: Int,
                    channels: Int): Array[Byte] = {
    require(channels >= 1 && sampleRate > 0)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s))
    bb.array()
  }

  /** Channel mixdown: per-frame integer mean (truncating), one Int per
    * frame. A trailing partial frame is dropped. */
  def monoOf(p: Pcm): Array[Int] = {
    val frames = p.samples.length / p.channels
    val out = new Array[Int](frames)
    var f = 0
    while (f < frames) {
      var s = 0
      var c = 0
      while (c < p.channels) { s += p.samples(f * p.channels + c); c += 1 }
      out(f) = s / p.channels
      f += 1
    }
    out
  }

  val FrameLen = 256

  /** 64-bit energy-delta fingerprint over mono samples: 65 frames of
    * [[FrameLen]] samples (missing frames read as silence), per-frame
    * energy = Σ|s|, bit i set iff energy(i+1) > energy(i). */
  def energyFingerprint64(mono: Array[Int]): Long = {
    val e = new Array[Long](65)
    var f = 0
    while (f < 65) {
      var s = 0L
      var k = f * FrameLen
      val end = math.min((f + 1) * FrameLen, mono.length)
      while (k < end) { s += math.abs(mono(k).toLong); k += 1 }
      e(f) = s
      f += 1
    }
    var acc = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) acc |= (1L << i)
      i += 1
    }
    acc
  }

  /** Total fingerprint function on ANY payload: real WAV decode when
    * the container parses, else the raw bytes interpreted as PCM16 LE
    * mono — the same real-decode-with-raw-fallback discipline as
    * [[Multimodal.ImageIo.grayOf]], so the operator never throws on a
    * corrupt corpus. Returns (fingerprint, n_mono_samples, rate,
    * decoded?). */
  def fingerprintOf(payload: Array[Byte]): (Long, Long, Int, Boolean) =
    decodePcm16(payload) match {
      case Some(p) =>
        val mono = monoOf(p)
        (energyFingerprint64(mono), mono.length.toLong, p.sampleRate, true)
      case None =>
        val n = payload.length / 2
        val raw = new Array[Int](n)
        var i = 0
        while (i < n) { raw(i) = le16(payload, i * 2).toShort.toInt; i += 1 }
        (energyFingerprint64(raw), n.toLong, 0, false)
    }

  /** Adds `afp` (energy-delta fingerprint), `n_samples`, `rate_hz`,
    * `decoded` to audio rows — narrow per-partition pass, payloads
    * never shuffle (the [[Multimodal.withAHash]] shape). */
  def withFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val (fp, n, rate, ok) = fingerprintOf(bytes)
          (id, fp, n, rate, ok)
        }
      }
      .toDF("media_id", "afp", "n_samples", "rate_hz", "decoded")
  }

  /** Perceptual audio near-dup pairs: 4×16-bit banding over `afp` —
    * pairs within Hamming ≤ 3 must share an intact band (pigeonhole),
    * candidate generation is an equi-join on (band, value), and only
    * (hash, id) pairs shuffle. Identical economics to
    * [[Multimodal.nearDupPairsByAHash]]. */
  def nearDupPairsByFingerprint(media: DataFrame,
                                maxHamming: Int): DataFrame = {
    val hashed = withFingerprint(media)
      .select(col("media_id"), col("afp")).localCheckpoint()
    val banded = hashed.select(col("media_id"), col("afp"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("afp"), b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("bv"))): _*)).as("bk"))
      .select(col("media_id"), col("afp"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    val a = banded.select(col("media_id").as("id_a"),
      col("afp").as("fp_a"), col("band"), col("bv"))
    val b = banded.select(col("media_id").as("id_b"),
      col("afp").as("fp_b"), col("band").as("band2"), col("bv").as("bv2"))
    a.join(b, col("band") === col("band2") && col("bv") === col("bv2") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

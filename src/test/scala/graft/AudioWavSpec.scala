package graft

import org.apache.spark.sql.functions._

import graft.operators.{AudioWav, Multimodal}

class AudioWavSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic signal: per-frame constant amplitude from
    * a seed-mixed hash, so frame energies are far apart (≫ truncation
    * noise) and the energy-delta bits are stable under scaling. */
  private def synthSamples(seed: Long, frames: Int): Array[Short] = {
    val out = new Array[Short](frames * AudioWav.FrameLen)
    for (f <- 0 until frames) {
      val h = (seed * 6364136223846793005L + f * 1442695040888963407L)
      val amp = (math.abs(h % 8000L) + 100L).toInt // 100..8099
      for (k <- 0 until AudioWav.FrameLen) {
        val s = if (k % 2 == 0) amp else -amp
        out(f * AudioWav.FrameLen + k) = s.toShort
      }
    }
    out
  }

  test("WAV round trip: write → decode returns the exact samples and format") {
    val samples = synthSamples(7L, 10)
    val wav = AudioWav.writePcm16Wav(samples, 16000, 1)
    val p = AudioWav.decodePcm16(wav).get
    assert(p.sampleRate == 16000 && p.channels == 1)
    assert(p.samples.toSeq == samples.toSeq)
  }

  test("stereo mixdown is the truncating per-frame mean") {
    // L=10,R=21 → 15 (31/2 truncates); L=-10,R=-21 → -15 (toward zero)
    val inter = Array[Short](10, 21, -10, -21)
    val wav = AudioWav.writePcm16Wav(inter, 8000, 2)
    val mono = AudioWav.monoOf(AudioWav.decodePcm16(wav).get)
    assert(mono.toSeq == Seq(15, -15))
  }

  test("chunk walk skips unknown chunks and tolerates a LIST tail") {
    val samples = synthSamples(3L, 4)
    val wav = AudioWav.writePcm16Wav(samples, 44100, 1)
    // splice an unknown 6-byte chunk (odd size exercises the pad rule)
    // between fmt and data, and append a LIST chunk after data
    val junk = "junk".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val tail = "LIST".getBytes("US-ASCII") ++ Array[Byte](2, 0, 0, 0, 9, 9)
    val spliced = wav.slice(0, 36) ++ junk ++ wav.slice(36, wav.length) ++ tail
    // fix the RIFF size field (bytes 4..7, LE)
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    spliced(6) = ((total >> 16) & 0xff).toByte
    spliced(7) = ((total >> 24) & 0xff).toByte
    val p = AudioWav.decodePcm16(spliced).get
    assert(p.samples.toSeq == samples.toSeq)
  }

  test("malformed bytes decode to None, never throw") {
    val samples = synthSamples(5L, 2)
    val wav = AudioWav.writePcm16Wav(samples, 16000, 1)
    for (cut <- Seq(0, 3, 11, 20, 43, wav.length - 1)) {
      assert(AudioWav.decodePcm16(wav.take(cut)).isEmpty, s"cut=$cut")
    }
    val nonPcm = wav.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(AudioWav.decodePcm16(nonPcm).isEmpty)
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 200) {
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte)
      AudioWav.decodePcm16(junk) // must not throw
    }
  }

  test("fingerprint is amplitude-invariant and discriminates different audio") {
    val a = synthSamples(11L, 66)
    val half = a.map(s => (s / 2).toShort)
    val fpA = AudioWav.energyFingerprint64(
      AudioWav.monoOf(AudioWav.Pcm(a, 16000, 1)))
    val fpHalf = AudioWav.energyFingerprint64(
      AudioWav.monoOf(AudioWav.Pcm(half, 16000, 1)))
    assert(fpA == fpHalf, "halving amplitude must preserve energy deltas")
    val b = synthSamples(99L, 66)
    val fpB = AudioWav.energyFingerprint64(
      AudioWav.monoOf(AudioWav.Pcm(b, 16000, 1)))
    assert(java.lang.Long.bitCount(fpA ^ fpB) > 10,
      "independent signals should disagree on many deltas")
  }

  test("small local edit moves only the edited frame's two delta bits") {
    val a = synthSamples(23L, 66)
    val fp = (s: Array[Short]) => AudioWav.energyFingerprint64(
      AudioWav.monoOf(AudioWav.Pcm(s, 16000, 1)))
    val before = fp(a)
    // pick a frame f whose rising-energy bit is SET, silence frame f+1:
    // bit f must flip 1→0 (energy can't rise into silence, and frame f
    // is never silent by construction); only bits f and f+1 may change
    val f = (10 until 50).find(i => (before >> i & 1L) == 1L).get
    val edited = a.clone()
    for (k <- 0 until AudioWav.FrameLen)
      edited((f + 1) * AudioWav.FrameLen + k) = 0
    val after = fp(edited)
    val diff = before ^ after
    val mask = (1L << f) | (1L << (f + 1))
    assert((diff & (1L << f)) != 0, "the guaranteed flip")
    assert((diff & ~mask) == 0L,
      s"edit at frame ${f + 1} must not move bits outside $f/${f + 1}")
  }

  test("withFingerprint: real WAV payloads decode; text payloads take the raw fallback") {
    val docs = Seq(
      (1L, "audio", AudioWav.writePcm16Wav(synthSamples(1L, 8), 16000, 1)),
      (4L, "audio", "not audio at all".getBytes("UTF-8")),
      (2L, "image", Array[Byte](1, 2))
    ).toDF("media_id", "kind", "payload")
    val got = AudioWav.withFingerprint(docs)
      .orderBy(col("media_id")).collect()
    assert(got.length == 2) // image row filtered out
    assert(got(0).getBoolean(4) && got(0).getInt(3) == 16000 &&
      got(0).getLong(2) == 8L * AudioWav.FrameLen)
    assert(!got(1).getBoolean(4) && got(1).getInt(3) == 0 &&
      got(1).getLong(2) == 8L) // 16 bytes → 8 raw samples
  }

  test("near-dup pairs: identical audio pairs at hamming 0; different does not pair") {
    val base = synthSamples(42L, 66)
    val reencoded = base.map(s => (s / 2).toShort) // same content, half gain
    val other = synthSamples(1042L, 66)
    val media = Seq(
      (1L, "audio", AudioWav.writePcm16Wav(base, 16000, 1)),
      (2L, "audio", AudioWav.writePcm16Wav(reencoded, 16000, 2 - 1)),
      (3L, "audio", AudioWav.writePcm16Wav(other, 16000, 1))
    ).toDF("media_id", "kind", "payload")
    val pairs = AudioWav.nearDupPairsByFingerprint(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("fromDocuments audio rows flow through the fingerprint pass end-to-end") {
    val docs = Seq((1L, "alpha beta"), (4L, "gamma delta"), (7L, "alpha beta"))
      .toDF("doc_id", "text")
    val media = Multimodal.fromDocuments(docs)
    val fps = AudioWav.withFingerprint(media).collect()
    // doc_id % 3 == 1 → audio: ids 1, 4, 7
    assert(fps.map(_.getLong(0)).toSet == Set(1L, 4L, 7L))
    // identical payload bytes ⇒ identical fingerprint (ids 1 and 7)
    val byId = fps.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == byId(7L))
  }
}

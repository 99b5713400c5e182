package graft

import org.apache.spark.sql.functions._

import graft.operators.VideoContainer
import graft.operators.VideoContainer.FragmentMeta

/** Fragmented-MP4 (CMAF) moof census: writer→parser round trips over
  * single- and multi-traf fragments, the Some(Nil) contract for valid
  * unfragmented files, sequence-gap detection through the DataFrame
  * surface, and the family's bad-byte tolerance (strict prefixes and
  * seeded fuzz → None, never a throw). */
class FragmentedMp4Spec extends SparkSpec {
  import spark.implicits._

  private val fmp4 = VideoContainer.writeFmp4("cmfc", 600L, 7200L,
    Seq(
      (1L, Seq((1L, 30L))),
      (2L, Seq((1L, 30L), (2L, 48L))),
      (3L, Seq((1L, 12L)))))

  test("moof round trip: sequence, track ids, summed trun samples") {
    assert(VideoContainer.parseFragments(fmp4).contains(Seq(
      FragmentMeta(1L, Seq(1L), 30L),
      FragmentMeta(2L, Seq(1L, 2L), 78L),
      FragmentMeta(3L, Seq(1L), 12L))))
  }

  test("a valid unfragmented mp4 reads as Some(Nil), not an error") {
    val plain = VideoContainer.writeMp4("isom", 600L, 7200L, Seq("vide"))
    assert(VideoContainer.parseFragments(plain).contains(Nil))
  }

  test("a moof without its mandatory mfhd is malformed") {
    // strip the mfhd by writing a fragment, then blanking its type tag
    val b = fmp4.clone()
    val i = indexOfType(b, "mfhd")
    "xxxx".getBytes("US-ASCII").copyToArray(b, i)
    assert(VideoContainer.parseFragments(b).isEmpty)
  }

  test("strict prefixes: None, or a fragment-boundary prefix of the list") {
    // fMP4 is streamable — a cut at a fragment boundary is a valid
    // shorter stream, so the contract is "never throws, never
    // fabricates": every prefix is either malformed (None) or a
    // STRICT PREFIX of the full fragment list
    val full = VideoContainer.parseFragments(fmp4).get
    var boundaryCuts = 0
    (1 until fmp4.length).foreach { n =>
      VideoContainer.parseFragments(fmp4.take(n)) match {
        case None => ()
        case Some(fs) =>
          assert(fs.length < full.length && fs == full.take(fs.length),
            s"len=$n")
          boundaryCuts += 1
      }
    }
    // exactly the cuts after moov and after fragments 1 and 2
    assert(boundaryCuts == 3)
  }

  test("seeded fuzz and bit flips never throw") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(96))(rnd.nextInt.toByte)
      VideoContainer.parseFragments(junk) // must not throw
      val flipped = fmp4.clone()
      flipped(rnd.nextInt(flipped.length)) =
        (flipped(rnd.nextInt(flipped.length)) ^ (1 << rnd.nextInt(8))).toByte
      VideoContainer.parseFragments(flipped) // must not throw
    }
  }

  test("census columns: counts, tracks, and the sequence-gap tripwire") {
    val gapped = VideoContainer.writeFmp4("cmfc", 600L, 7200L,
      Seq((1L, Seq((1L, 30L))), (3L, Seq((1L, 30L))))) // seq 2 dropped
    val media = Seq(
      ("ok", fmp4),
      ("gap", gapped),
      ("junk", Array[Byte](1, 2, 3, 4))).toDF("media_id", "payload")
    val got = VideoContainer.withFragmentCensus(media)
      .select(col("media_id"), col("n_fragments"), col("n_samples"),
        col("n_frag_tracks"), col("seq_contiguous"))
      .as[(String, Option[Long], Option[Long], Option[Long], Option[Boolean])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("ok") == ((Some(3L), Some(120L), Some(2L), Some(true))))
    assert(got("gap") == ((Some(2L), Some(60L), Some(1L), Some(false))))
    assert(got("junk") == ((None, None, None, None)))
  }

  private def indexOfType(b: Array[Byte], typ: String): Int = {
    val pat = typ.getBytes("US-ASCII")
    b.indices.find(i => i + 4 <= b.length &&
      pat.indices.forall(j => b(i + j) == pat(j))).get
  }
}

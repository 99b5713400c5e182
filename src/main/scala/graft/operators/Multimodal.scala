package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque BINARY payloads with
  * typed metadata, processed by per-partition batch operators.
  *
  * The Spark-side plumbing is real — schema, partition sizing, batched
  * per-partition execution (the JVM shape of a pandas-UDF/mapInPandas
  * stage), deterministic outputs. The IMAGE leg is real end-to-end:
  * [[ImageIo]] pixel-decodes PNG/GIF/BMP via the JDK's `javax.imageio`
  * (deterministic BT.601 gray conversion), feeding the same GRAY8
  * resize/aHash kernels the synthetic raster format uses. Audio/video
  * decode stays behind the [[Codec]] seam (`StubCodec` derives
  * deterministic fake features — no audio/video libs ship with the
  * JDK); swapping in a real codec changes no plan shape.
  *
  * Scale notes: payloads never pass through a shuffle in these operators
  * (mapPartitions is narrow); metadata-only queries project away the
  * binary column so parquet scans skip the heavy pages entirely.
  */
object Multimodal {

  /** Typed media row: payload + the metadata a curation pipeline keys on. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  final case class Feature(media_id: Long, kind: String, n_bytes: Long,
                           feature: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Codec seam: decode/resize/frame-sample land here. */
  trait Codec extends Serializable {
    def decodeFeature(kind: String, payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake codec: feature[i] = f(bytes, i) — stands in for
    * real decode (STUB; no media libs in this container). */
  object StubCodec extends Codec {
    def decodeFeature(kind: String, payload: Array[Byte],
                      dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // FNV-ish rolling state over the payload
      var i = 0
      while (i < payload.length) { h = h * 31 + payload(i); i += 1 }
      var d = 0
      while (d < dim) {
        val x = h ^ (d * 0x9E3779B97F4A7C15L)
        out(d) = ((x % 1000L).toFloat) / 1000f
        d += 1
      }
      out
    }
  }

  /** Pure-JVM image container header parsing — a REAL decode leg (no
    * native libs needed; derived from the public PNG/GIF/BMP format
    * specs). Reads width/height from the first bytes of the payload:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk is mandated first —
    *    width/height are big-endian u32 at offsets 16/20.
    *  - GIF (87a/89a): logical screen descriptor — little-endian u16
    *    at offsets 6/8.
    *  - BMP ("BM" + BITMAPINFOHEADER): little-endian i32 at offsets
    *    18/22 (height may be negative = top-down; absolute value).
    *  - JPEG (FFD8 SOI): marker walk to the first SOFn frame header,
    *    which carries height/width as big-endian u16 — dominant format
    *    in any real web corpus, so the sniffing must not stop at the
    *    lossless three.
    */
  object ImageHeaders {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
        (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def be16(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 8) | u8(b, i + 1)
    private def le16(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
        (u8(b, i + 3) << 24)

    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** JPEG marker walk: SOI (FFD8) then segments until the first
      * frame header SOFn (FFC0–FFCF minus DHT C4 / JPG C8 / DAC CC),
      * whose payload is precision u8, height u16be, width u16be. Stops
      * (None) on lost marker sync, SOS/EOI before any SOF, or a
      * truncated buffer — never throws, never reads past the array. */
    private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 2 // past SOI
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return None
        var j = i + 1
        while (j < b.length && u8(b, j) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return None
        val m = u8(b, j)
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i = j + 1 // standalone
        else if (m == 0xd9 || m == 0xda) return None // EOI / SOS first
        else {
          if (j + 2 >= b.length) return None
          val len = be16(b, j + 1)
          if (len < 2) return None
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
            m != 0xcc) {
            if (j + 7 >= b.length) return None
            return Some((be16(b, j + 6), be16(b, j + 4)))
          }
          i = j + 1 + len
        }
      }
      None
    }

    /** (width, height) if the payload starts with a recognized image
      * container header; None otherwise (never throws). */
    def dims(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes == null) return None
      if (bytes.length >= 24 && bytes.startsWith(PngSig) &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
        bytes(15) == 'R')
        Some((be32(bytes, 16).toInt, be32(bytes, 20).toInt))
      else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
        Some((le16(bytes, 6), le16(bytes, 8)))
      else if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M')
        Some((le32(bytes, 18), math.abs(le32(bytes, 22))))
      else if (bytes.length >= 4 && u8(bytes, 0) == 0xff &&
        u8(bytes, 1) == 0xd8)
        jpegDims(bytes)
      else None
    }
  }

  /** Real codec for image rows: decodes (width, height) from the
    * container header into feature[0]/feature[1] (rest zero; feature[2]
    * flags a successful parse). Non-image kinds and unrecognized
    * payloads fall back to [[StubCodec]] so mixed-media frames keep
    * working. */
  object ImageHeaderCodec extends Codec {
    def decodeFeature(kind: String, payload: Array[Byte],
                      dim: Int): Array[Float] =
      if (kind == "image") ImageHeaders.dims(payload) match {
        case Some((w, h)) =>
          val out = new Array[Float](dim)
          if (dim > 0) out(0) = w.toFloat
          if (dim > 1) out(1) = h.toFloat
          if (dim > 2) out(2) = 1f // parsed-ok flag
          out
        case None => StubCodec.decodeFeature(kind, payload, dim)
      } else StubCodec.decodeFeature(kind, payload, dim)
  }

  /** Adds parsed_width/parsed_height columns from real header decode
    * (null when the payload is not a recognized image container).
    * Narrow per-partition pass — payloads never shuffle. */
  def withParsedDims(media: DataFrame): DataFrame = {
    val parse = udf { payload: Array[Byte] =>
      ImageHeaders.dims(payload)
    }
    media.withColumn("_dims", parse(col("payload")))
      .withColumn("parsed_width", col("_dims._1"))
      .withColumn("parsed_height", col("_dims._2"))
      .drop("_dims")
  }

  /** Synthesize a media table from the documents table (payload = utf8
    * bytes): lets every downstream operator run on driver-provided data
    * without fabricating new inputs. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 32).cast("int").as("width"),
      (col("doc_id") % 480 + 32).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("doc_id") % 300 + 1).cast("int").as("n_frames"))

  /** Batched per-partition feature extraction — the mapInPandas shape on
    * the JVM: one codec instance per partition, rows processed in a tight
    * loop, output as a typed Dataset. Narrow (no shuffle). */
  def extractFeatures(media: DataFrame, codec: Codec, dim: Int): Dataset[Feature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          Feature(id, kind, bytes.length.toLong,
            codec.decodeFeature(kind, bytes, dim))
        }
      }
  }

  /** Deterministic frame sampling plan for video rows: every k-th frame
    * index up to n_frames — pure column expressions (sequence+filter), no
    * decode involved until the codec seam. */
  def sampleFrameIndexes(media: DataFrame, everyK: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        filter(sequence(lit(0), col("n_frames") - 1),
          i => i % everyK === 0).as("frame_idx"))

  /** Metadata-only projection — must prune the payload column at the scan
    * (verify via ReadSchema in explain). */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"), col("width"), col("height"),
      col("sample_rate"), col("n_frames"))

  /** Aspect-preserving resize PLAN for image rows: target dims for a
    * `maxSide` bound, computed with integer column math only (floor
    * scaling, never upscale) — the real, testable half of a resize.
    * out_w/out_h = dims · maxSide / longest-side, ties handled by the
    * floor; payload untouched. The pixel half goes through the codec
    * seam below. */
  private def outDims(maxSide: Int): (Column, Column) = {
    val longSide = greatest(col("width"), col("height"))
    val need = longSide > maxSide
    (when(need, floor(col("width") * maxSide / longSide).cast("int"))
       .otherwise(col("width")),
     when(need, floor(col("height") * maxSide / longSide).cast("int"))
       .otherwise(col("height")))
  }

  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val (w, h) = outDims(maxSide)
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("width"), col("height"),
        w.as("out_w"), h.as("out_h"))
  }

  /** Pure-JVM nearest-neighbor down-sampler over the GRAY8 synthetic
    * raster format (row-major, 1 byte per pixel, width·height bytes):
    * out(y,x) = src(⌊y·srcH/outH⌋, ⌊x·srcW/outW⌋) — all integer index
    * math, no imaging libs. Payloads shorter than srcW·srcH (real
    * container bytes rather than rasters) read as 0 past their end, so
    * the kernel is total and deterministic on ANY input. This is the
    * default pixel kernel behind [[resizePayloads]]'s seam; a real
    * imaging codec (JPEG decode → scale → encode) swaps in through the
    * same function signature without touching the Spark plumbing. */
  def nearestNeighborGray8(bytes: Array[Byte], srcW: Int, srcH: Int,
                           outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(0, outW) * math.max(0, outH))
    var y = 0
    while (y < outH) {
      val sy = y.toLong * srcH / outH
      var x = 0
      while (x < outW) {
        val si = sy * srcW + x.toLong * srcW / outW
        out(y * outW + x) =
          if (si >= 0 && si < bytes.length) bytes(si.toInt) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real image pixel decode via the JDK's `javax.imageio` (the PNG /
    * GIF / BMP / JPEG readers ship with every JDK — no external jar).
    * Decoded pixels are converted to GRAY8 with integer BT.601 luma
    * (⌊(299·r + 587·g + 114·b) / 1000⌋) instead of the platform ICC
    * colorspace path, so the raster is deterministic across JDK
    * implementations for the lossless formats — and for gray PNGs
    * (r==g==b==v) the luma is exactly v, making the decoded raster
    * bit-identical to the raw GRAY8 synthetic format. JPEG is the one
    * determinism caveat: the IDCT is decoder-dependent, so cross-JDK
    * pixel values may differ by ±1 gray — downstream consumers must
    * treat JPEG rasters perceptually (aHash Hamming tolerance, the
    * MultimodalSpec discipline), never bit-exactly. This closes the
    * codec seam: container payloads take the real-decode path; raw
    * GRAY8 rasters and garbage fall back to the byte-raster
    * interpretation, so every operator stays total on mixed inputs. */
  object ImageIo {
    javax.imageio.ImageIO.setUseCache(false) // never spill decode temp files

    /** Decode a real image container to (GRAY8 raster, width, height).
      * None when the payload is not a decodable image (never throws).
      * Header-sniffs via [[ImageHeaders]] before invoking ImageIO so
      * non-image payloads skip the reader-discovery cost entirely. */
    def decodeGray8(bytes: Array[Byte]): Option[(Array[Byte], Int, Int)] = {
      if (bytes == null || ImageHeaders.dims(bytes).isEmpty) return None
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val out = new Array[Byte](w * h)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val p = row(x)
              val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
              val b = p & 0xff
              out(y * w + x) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
              x += 1
            }
            y += 1
          }
          Some((out, w, h))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** (GRAY8 raster, width, height) for ANY payload: real decode when
      * the bytes are a decodable image (decoded dims win over claimed
      * metadata dims — metadata may lie), raw byte-raster view at the
      * claimed dims otherwise. */
    def grayOf(payload: Array[Byte], claimedW: Int, claimedH: Int)
        : (Array[Byte], Int, Int) =
      decodeGray8(payload).getOrElse((payload, claimedW, claimedH))

    /** Seam-compatible resample kernel (the [[resizePayloads]] default):
      * decode-then-subsample for real images, byte-raster subsample
      * otherwise. */
    def resample(payload: Array[Byte], srcW: Int, srcH: Int,
                 outW: Int, outH: Int): Array[Byte] = {
      val (gray, w, h) = grayOf(payload, srcW, srcH)
      nearestNeighborGray8(gray, w, h, outW, outH)
    }
  }

  /** Codec with the real pixel path: image rows that decode get
    * feature = [width, height, 1 (parsed flag), mean gray]; image rows
    * with only a recognized header degrade to [[ImageHeaderCodec]]
    * semantics; everything else falls back to [[StubCodec]]. */
  object ImageIoCodec extends Codec {
    def decodeFeature(kind: String, payload: Array[Byte],
                      dim: Int): Array[Float] =
      if (kind == "image") ImageIo.decodeGray8(payload) match {
        case Some((gray, w, h)) =>
          val out = new Array[Float](dim)
          if (dim > 0) out(0) = w.toFloat
          if (dim > 1) out(1) = h.toFloat
          if (dim > 2) out(2) = 1f
          if (dim > 3 && gray.nonEmpty) {
            var s = 0L; var i = 0
            while (i < gray.length) { s += gray(i) & 0xff; i += 1 }
            out(3) = (s / gray.length).toFloat // integer mean gray
          }
          out
        case None => ImageHeaderCodec.decodeFeature(kind, payload, dim)
      } else StubCodec.decodeFeature(kind, payload, dim)
  }

  /** Pixel-resize pass: per-partition batched map that carries each
    * image payload plus its [[resizePlan]] target through `resample`
    * (payload, srcW, srcH, outW, outH) ⇒ resized bytes. The default
    * kernel is [[ImageIo.resample]] — REAL pixel decode (PNG/GIF/BMP
    * via the JDK's ImageIO) with deterministic BT.601 gray conversion,
    * falling back to the raw GRAY8 byte-raster interpretation for
    * non-image payloads. Narrow (payloads never shuffle). */
  def resizePayloads(media: DataFrame, maxSide: Int,
                     resample: (Array[Byte], Int, Int, Int, Int) => Array[Byte] =
                       ImageIo.resample)
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val (w, h) = outDims(maxSide)
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("payload"),
        col("width"), col("height"), w.as("out_w"), h.as("out_h"))
      .as[(Long, Array[Byte], Int, Int, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, payload, sw, sh, w, h) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          (id, w, h, resample(bytes, sw, sh, w, h))
        }
      }
      .toDF("media_id", "out_w", "out_h", "resized")
  }

  /** 64-bit average hash (aHash) of a GRAY8 raster — the standard
    * perceptual image near-dup signature: downsample to 8×8 with
    * [[nearestNeighborGray8]], take the integer mean of the 64 gray
    * values, set bit (8y+x) iff pixel(y,x) ≥ mean. Scale-invariant by
    * construction (any k× integer upscale of a raster hashes
    * identically — the downsample lands on the same pixels) and robust
    * to small local edits (few bits flip ⇒ small Hamming distance).
    * Pure integer math on bytes; no imaging libs. */
  def aHash64(bytes: Array[Byte], srcW: Int, srcH: Int): Long = {
    val px = nearestNeighborGray8(bytes, srcW, srcH, 8, 8)
      .map(_ & 0xff)
    val mean = px.sum / 64
    px.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      if (p >= mean) acc | (1L << i) else acc
    }
  }

  /** Adds a `phash` column (aHash of the payload) to image rows —
    * narrow per-partition pass, payloads never shuffle. Real image
    * containers are pixel-decoded first ([[ImageIo.grayOf]]), so a PNG
    * and the raw GRAY8 raster of the same gray pixels hash
    * identically (spec-asserted). */
  def withAHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("payload"), col("width"), col("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, payload, w, h) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val (gray, gw, gh) = ImageIo.grayOf(bytes, w, h)
          (id, aHash64(gray, gw, gh))
        }
      }
      .toDF("media_id", "phash")
  }

  /** Perceptual near-duplicate pairs: band the 64-bit hash into four
    * 16-bit keys and equi-join on (band index, band value) — pairs
    * within Hamming distance ≤ 3 MUST share at least one intact band
    * (pigeonhole over 4 bands), so recall at the verify threshold is
    * exact, and candidate generation is never a cross join. The verify
    * leg is the codegen'd `bit_count(a ^ b) <= maxHamming` (maxHamming
    * ≤ 3 for the guarantee; higher trades recall). Same banding
    * economics as the MinHash/SimHash paths — at 100 TB the band join
    * shuffles (hash, id) pairs only. */
  def nearDupPairsByAHash(media: DataFrame, maxHamming: Int): DataFrame = {
    // both self-join sides read this frame: checkpoint the (media_id,
    // phash) rows — 16 bytes each — so the payload-scanning hash pass
    // runs once, not once per side (the q78 reciprocity-join lesson)
    val hashed = withAHash(media).localCheckpoint()
    val banded = hashed.select(col("media_id"), col("phash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("phash"), b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("bv"))): _*)).as("bk"))
      .select(col("media_id"), col("phash"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    val a = banded.select(col("media_id").as("id_a"),
      col("phash").as("ph_a"), col("band"), col("bv"))
    val b = banded.select(col("media_id").as("id_b"),
      col("phash").as("ph_b"), col("band").as("band2"), col("bv").as("bv2"))
    a.join(b, col("band") === col("band2") && col("bv") === col("bv2") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

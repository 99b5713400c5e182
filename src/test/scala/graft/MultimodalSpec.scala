package graft

import java.util.Base64

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // a genuine, complete 1x1 PNG file (signature + IHDR + IDAT + IEND)
  private val realPng: Array[Byte] = Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8" +
      "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")

  // hand-built container headers per the public specs
  private def pngHeader(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array(0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
      w >>> 24, (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0xff,
      h >>> 24, (h >> 16) & 0xff, (h >> 8) & 0xff, h & 0xff)
    (sig ++ ihdr).map(_.toByte)
  }
  private def gifHeader(w: Int, h: Int): Array[Byte] =
    ("GIF89a".getBytes("US-ASCII") ++ Array(
      w & 0xff, w >> 8, h & 0xff, h >> 8, 0, 0, 0).map(_.toByte))
  private def bmpHeader(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](26)
    b(0) = 'B'; b(1) = 'M'
    def le32(i: Int, v: Int): Unit = {
      b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
      b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
    }
    le32(18, w); le32(22, h)
    b
  }

  test("real PNG file decodes to its actual dimensions") {
    assert(Multimodal.ImageHeaders.dims(realPng) == Some((1, 1)))
  }

  test("PNG/GIF/BMP headers parse; garbage and nulls do not") {
    assert(Multimodal.ImageHeaders.dims(pngHeader(640, 480)) == Some((640, 480)))
    assert(Multimodal.ImageHeaders.dims(gifHeader(320, 200)) == Some((320, 200)))
    assert(Multimodal.ImageHeaders.dims(bmpHeader(800, 600)) == Some((800, 600)))
    // top-down BMP stores negative height; dims reports the magnitude
    assert(Multimodal.ImageHeaders.dims(bmpHeader(16, -32)) == Some((16, 32)))
    assert(Multimodal.ImageHeaders.dims("not an image".getBytes) == None)
    assert(Multimodal.ImageHeaders.dims(Array.emptyByteArray) == None)
    assert(Multimodal.ImageHeaders.dims(null) == None)
  }

  test("withParsedDims decodes image payloads in a narrow pass") {
    val media = Seq(
      (1L, "image", pngHeader(12, 34)),
      (2L, "image", gifHeader(56, 78)),
      (3L, "image", "garbage".getBytes)).toDF("media_id", "kind", "payload")
    val out = Multimodal.withParsedDims(media)
      .select(col("media_id"), col("parsed_width"), col("parsed_height"))
      .orderBy(col("media_id")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
    assert(out.toSeq == Seq((1L, 12, 34), (2L, 56, 78), (3L, -1, -1)))
  }

  test("ImageHeaderCodec: real decode for images, stub fallback otherwise") {
    val c = Multimodal.ImageHeaderCodec
    val f = c.decodeFeature("image", realPng, 4)
    assert(f.toSeq == Seq(1f, 1f, 1f, 0f))
    val f2 = c.decodeFeature("image", pngHeader(640, 480), 4)
    assert(f2.toSeq == Seq(640f, 480f, 1f, 0f))
    // unparseable image payload and non-image kinds = stub features
    val garbage = "xyz".getBytes
    assert(c.decodeFeature("image", garbage, 4).toSeq ==
      Multimodal.StubCodec.decodeFeature("image", garbage, 4).toSeq)
    assert(c.decodeFeature("audio", realPng, 4).toSeq ==
      Multimodal.StubCodec.decodeFeature("audio", realPng, 4).toSeq)
  }

  test("extractFeatures with ImageHeaderCodec end-to-end") {
    val media = Seq((7L, "image", pngHeader(100, 50)))
      .toDF("media_id", "kind", "payload")
    val feats = Multimodal.extractFeatures(media,
      Multimodal.ImageHeaderCodec, dim = 3).collect()
    assert(feats.length == 1)
    assert(feats.head.feature.toSeq == Seq(100f, 50f, 1f))
  }

  test("resizePlan: aspect-preserving floor scale, never upscales") {
    val media = Seq(
      (1L, "image", 2048, 1024), // downscale, landscape
      (2L, "image", 300, 900),   // downscale, portrait
      (3L, "image", 512, 200),   // within bound: untouched
      (4L, "video", 4096, 4096)  // wrong kind: excluded
    ).toDF("media_id", "kind", "width", "height")
    val got = Multimodal.resizePlan(media, maxSide = 512)
      .orderBy(col("media_id"))
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getInt(4)))
    assert(got.toSeq == Seq((1L, 512, 256), (2L, 170, 512), (3L, 512, 200)))
  }

  test("resizePayloads: nearest-neighbor kernel actually subsamples pixels") {
    // GRAY8 raster 8×4 (row-major, 1 byte/pixel): pixel value encodes its
    // coordinates as 16*y + x, so subsampled output pixels are predictable
    val srcW = 8; val srcH = 4
    val raster = Array.tabulate(srcW * srcH) { i =>
      (16 * (i / srcW) + (i % srcW)).toByte
    }
    val media = Seq(
      (1L, "image", raster, srcW, srcH),
      (2L, "audio", raster, 9999, 9999)) // wrong kind: excluded
      .toDF("media_id", "kind", "payload", "width", "height")
    val got = Multimodal.resizePayloads(media, maxSide = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getAs[Array[Byte]](3).toSeq))
    // out 4×2: out(y,x) = src(y*4/2? ...) — src(⌊y·srcH/outH⌋, ⌊x·srcW/outW⌋)
    // = src(2y, 2x) ⇒ values 16·(2y) + 2x
    val want = for (y <- 0 until 2; x <- 0 until 4)
      yield (16 * (2 * y) + 2 * x).toByte
    assert(got.toSeq == Seq((1L, 4, 2, want)))
  }

  test("aHash64 is invariant under integer upscale of the raster") {
    // 8x8 pattern: left half dark, right half bright
    val base = Array.tabulate(64)(i => if (i % 8 < 4) 0 else 200)
      .map(_.toByte)
    // 16x16 2x nearest-neighbor upscale of the same pattern
    val up = Array.tabulate(256) { i =>
      val (y, x) = (i / 16, i % 16)
      base((y / 2) * 8 + (x / 2))
    }
    val h8 = Multimodal.aHash64(base, 8, 8)
    val h16 = Multimodal.aHash64(up, 16, 16)
    assert(h8 == h16)
    // right half >= mean: bits 8y+x for x in 4..7
    val want = (0 until 64).filter(_ % 8 >= 4)
      .foldLeft(0L)((a, i) => a | (1L << i))
    assert(h8 == want)
  }

  test("nearDupPairsByAHash: small edits pair up, different images don't") {
    def raster(edits: Set[Int]): Array[Byte] =
      Array.tabulate(256) { i =>
        val (y, x) = (i / 16, i % 16)
        val sampled = (y / 2) * 8 + (x / 2) // pixel the 8x8 downsample reads
        val bright = (x >= 8) ^ edits.contains(sampled)
        if (bright) 200.toByte else 0.toByte
      }
    val different = Array.tabulate(256) { i =>
      if ((i / 16) % 2 == 0) 200.toByte else 0.toByte // horizontal stripes
    }
    val media = Seq(
      (1L, "image", raster(Set.empty), 16, 16),
      // three flipped downsample pixels spread across three 16-bit bands
      (2L, "image", raster(Set(0, 17, 34)), 16, 16),
      (3L, "image", different, 16, 16),
      (4L, "audio", raster(Set.empty), 16, 16)) // wrong kind: excluded
      .toDF("media_id", "kind", "payload", "width", "height")
    val got = Multimodal.nearDupPairsByAHash(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 3)))
  }

  test("resizePayloads: kernel is total on short (non-raster) payloads") {
    val media = Seq((1L, "image", Array[Byte](7, 7, 7), 2048, 1024))
      .toDF("media_id", "kind", "payload", "width", "height")
    val got = Multimodal.resizePayloads(media, maxSide = 16)
      .collect().map(r => (r.getInt(1), r.getInt(2),
        r.getAs[Array[Byte]](3).length))
    // dims come from the plan; bytes past payload end read as 0
    assert(got.toSeq == Seq((16, 8, 128)))
  }

  // real PNG encode for the ImageIo decode tests: RGB pixels r=g=b=v(x,y)
  // (TYPE_INT_RGB round-trips sRGB values exactly through PNG, so the
  // BT.601 luma of (v,v,v) is exactly v — no colorspace surprises)
  private def grayAsRgbPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIo.decodeGray8: real PNG pixel decode, exact values and dims") {
    val png = grayAsRgbPng(8, 4, (x, y) => 16 * y + x)
    val Some((gray, w, h)) = Multimodal.ImageIo.decodeGray8(png)
    assert((w, h) == (8, 4))
    assert(gray.toSeq == Array.tabulate(32)(i => (16 * (i / 8) + i % 8).toByte).toSeq)
    // non-image payloads (raw rasters, garbage, header-only) decode to None
    assert(Multimodal.ImageIo.decodeGray8(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.ImageIo.decodeGray8(pngHeader(640, 480)).isEmpty)
    assert(Multimodal.ImageIo.decodeGray8(null).isEmpty)
  }

  test("ImageIo.decodeGray8: BT.601 integer luma on colored pixels") {
    val img = new java.awt.image.BufferedImage(
      3, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // pure red   → ⌊255·299/1000⌋ = 76
    img.setRGB(1, 0, 0x00ff00) // pure green → ⌊255·587/1000⌋ = 149
    img.setRGB(2, 0, 0x0000ff) // pure blue  → ⌊255·114/1000⌋ = 29
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((gray, _, _)) = Multimodal.ImageIo.decodeGray8(bos.toByteArray)
    assert(gray.toSeq == Seq(76.toByte, 149.toByte, 29.toByte))
  }

  test("resizePayloads default kernel decodes real PNGs (decoded dims win)") {
    val srcW = 8; val srcH = 4
    val png = grayAsRgbPng(srcW, srcH, (x, y) => 16 * y + x)
    // metadata claims the true dims (drives the out_w/out_h plan); the
    // pixels themselves come from the real decode, not a byte-raster view
    val media = Seq((1L, "image", png, srcW, srcH))
      .toDF("media_id", "kind", "payload", "width", "height")
    val got = Multimodal.resizePayloads(media, maxSide = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getAs[Array[Byte]](3).toSeq))
    // same expected pixels as the raw-raster test: src(2y, 2x) = 16·2y + 2x
    val want = for (y <- 0 until 2; x <- 0 until 4)
      yield (16 * (2 * y) + 2 * x).toByte
    assert(got.toSeq == Seq((1L, 4, 2, want)))
  }

  test("withAHash: a PNG and its raw GRAY8 raster twin hash identically") {
    // left-dark / right-bright pattern at 16×16
    def v(x: Int, y: Int): Int = if (x >= 8) 200 else 0
    val png = grayAsRgbPng(16, 16, v)
    val raster = Array.tabulate(256)(i => v(i % 16, i / 16).toByte)
    val media = Seq(
      (1L, "image", png, 16, 16),
      (2L, "image", raster, 16, 16)).toDF(
      "media_id", "kind", "payload", "width", "height")
    val pairs = Multimodal.nearDupPairsByAHash(media, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0))) // hamming 0: bit-identical hashes
  }

  test("ImageIo.decodeGray8 also decodes real GIF and BMP containers") {
    // pure black/white checkerboard: survives GIF palettization exactly
    // (mid-grays may be re-quantized by the GIF writer's palette)
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 2) {
      val g = if ((x + y) % 2 == 0) 0 else 255
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    // BMP: exact pixel round-trip (no palette)
    val bmpOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bmpOut))
    val Some((bmpGray, bw, bh)) = Multimodal.ImageIo.decodeGray8(bmpOut.toByteArray)
    assert((bw, bh) == (2, 2))
    assert(bmpGray.map(_ & 0xff).toSeq == Seq(0, 255, 255, 0))
    // GIF: the JDK WRITER may re-lay tiny images, so pin only what the
    // DECODER owns — dims parse and pixels drawn from the b/w palette
    // (pixel-exactness of the decode loop is already proven on PNG)
    val gifOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", gifOut))
    val Some((gifGray, gw, gh)) = Multimodal.ImageIo.decodeGray8(gifOut.toByteArray)
    assert((gw, gh) == (2, 2))
    assert(gifGray.map(_ & 0xff).toSet.subsetOf(Set(0, 255)))
  }

  test("JPEG: SOFn header sniff + real decode; aHash matches the PNG twin") {
    // smooth horizontal gradient — low-frequency content, so the lossy
    // JPEG round-trip perturbs pixels only slightly
    def v(x: Int, y: Int): Int = x * 16
    val w = 16; val h = 16
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val jpgOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jpgOut))
    val jpg = jpgOut.toByteArray
    // marker walk crosses the writer's APP0/DQT segments to the SOF
    assert(Multimodal.ImageHeaders.dims(jpg).contains((w, h)))
    // truncation before any SOF yields None, never a throw or over-read
    assert(Multimodal.ImageHeaders.dims(jpg.take(4)).isEmpty)
    assert(Multimodal.ImageHeaders.dims(jpg.take(2)).isEmpty)
    val Some((gray, gw, gh)) = Multimodal.ImageIo.decodeGray8(jpg)
    assert((gw, gh) == (w, h))
    // perceptual comparison, NOT bit-exact: JPEG IDCT output is
    // decoder-dependent (±1 gray across JDKs), so the contract is
    // aHash proximity to the lossless PNG twin
    val Some((pgray, _, _)) =
      Multimodal.ImageIo.decodeGray8(grayAsRgbPng(w, h, v))
    val hamming = java.lang.Long.bitCount(
      Multimodal.aHash64(gray, w, h) ^ Multimodal.aHash64(pgray, w, h))
    assert(hamming <= 2, s"JPEG vs PNG twin aHash Hamming $hamming")
    // the resample seam routes JPEG through the real decode too
    assert(Multimodal.ImageIo.resample(jpg, w, h, 8, 8).length == 64)
  }

  test("ImageIoCodec: pixel features for real PNGs, graceful degradation") {
    val png = grayAsRgbPng(4, 2, (_, _) => 100)
    val f = Multimodal.ImageIoCodec.decodeFeature("image", png, 4)
    assert(f.toSeq == Seq(4f, 2f, 1f, 100f)) // w, h, parsed, mean gray
    // header-only payload → ImageHeaderCodec semantics (dims, no mean)
    assert(Multimodal.ImageIoCodec.decodeFeature("image", pngHeader(640, 480), 4).toSeq ==
      Multimodal.ImageHeaderCodec.decodeFeature("image", pngHeader(640, 480), 4).toSeq)
    // non-image kinds → stub
    assert(Multimodal.ImageIoCodec.decodeFeature("audio", png, 4).toSeq ==
      Multimodal.StubCodec.decodeFeature("audio", png, 4).toSeq)
  }
}

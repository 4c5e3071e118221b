package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Multimodal binary-column plumbing: real PNG header parse, the
  * real Inflater-based pixel decode (verified pixel-exact against an
  * independently forward-filtered synthesized PNG), resize
  * arithmetic, and codegen-native frame sampling. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  /** Minimal PNG: signature + IHDR (no pixel payload — header
    * parsing must not need one). */
  private def png(w: Int, h: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(33)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    buf.putInt(13).put("IHDR".getBytes("US-ASCII"))
    buf.putInt(w).putInt(h).put(8.toByte).put(0.toByte) // bit depth 8, grayscale
    buf.put(0.toByte).put(0.toByte).put(0.toByte)       // compression/filter/interlace
    buf.array()
  }

  /** COMPLETE synthesized PNG: forward-filters `pixels` row by row
    * (an independent re-implementation of the spec's filters — the
    * decoder must invert it exactly), deflates, and wraps in real
    * chunks. `filters(y)` picks each row's filter type so one image
    * exercises every defilter branch. CRCs are zeroed (the decoder
    * documents it does not validate them). */
  private def realPng(w: Int, h: Int, colorType: Int, pixels: Array[Byte],
                      filters: Seq[Int]): Array[Byte] = {
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val stride = w * bpp
    require(pixels.length == stride * h && filters.length == h)
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val f = filters(y)
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) pixels(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(comp)
    deflater.end()
    val out = java.nio.ByteBuffer.allocate(8 + 25 + (12 + n) + 12)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
    out.put(0.toByte).put(0.toByte).put(0.toByte).putInt(0) // + zero CRC
    out.putInt(n).put("IDAT".getBytes("US-ASCII")).put(comp, 0, n).putInt(0)
    out.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(0)
    out.array()
  }

  test("PNG header parse without pixel data") {
    val df = Seq((1L, png(640, 480)), (2L, "not a png".getBytes.asInstanceOf[Array[Byte]]))
      .toDF("img_id", "content")
    val got = df.select(col("img_id"), Multimodal.imageInfo(col("content")).as("i"))
      .select(col("img_id"), col("i.width"), col("i.height"), col("i.bitDepth"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(got == Set((1L, 640, 480, 8), (2L, -1, -1, -1)))
  }

  test("real PNG decode is pixel-exact across all five filter types (gray + RGB)") {
    // Grayscale 8x5, one row per filter type 0..4, deterministic
    // non-trivial pixel values.
    val gw = 8; val gh = 5
    val gray = Array.tabulate(gw * gh)(i => ((i * 37 + 11) % 256).toByte)
    val grayPng = realPng(gw, gh, 0, gray, Seq(0, 1, 2, 3, 4))
    // RGB 5x5, same filter coverage, bpp=3 exercises the left/ul
    // predictors at pixel (not byte) offsets.
    val cw = 5; val ch = 5
    val rgb = Array.tabulate(cw * ch * 3)(i => ((i * 73 + 29) % 256).toByte)
    val rgbPng = realPng(cw, ch, 2, rgb, Seq(4, 3, 2, 1, 0))
    val df = Seq((1L, grayPng), (2L, rgbPng)).toDF("img_id", "content")
      .withColumn("pixels", Multimodal.decodeImage(col("content")))
    val got = df.select("img_id", "pixels").as[(Long, Seq[Int])].collect().toMap
    assert(got(1L) === gray.map(_ & 0xff).toSeq, "grayscale decode diverged")
    val rgbExpect = Array.tabulate(cw * ch) { i =>
      ((rgb(i * 3) & 0xff) << 16) | ((rgb(i * 3 + 1) & 0xff) << 8) | (rgb(i * 3 + 2) & 0xff)
    }.toSeq
    assert(got(2L) === rgbExpect, "RGB decode diverged")
  }

  test("real PNG decode fuzz: random sizes, pixels, and per-row filters round-trip (gray/RGB/RGBA)") {
    // Driver-side decode check (the kernel is plain JVM code): the
    // forward filter in realPng is an independent implementation,
    // so agreement on random inputs is a true differential test.
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(10)
      val colorType = Seq(0, 2, 6)(trial % 3)
      val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
      val pixels = Array.fill(w * h * bpp)(rnd.nextInt(256).toByte)
      val filters = Seq.fill(h)(rnd.nextInt(5))
      val decoded = Multimodal.decodePng(realPng(w, h, colorType, pixels, filters))
      assert(decoded != null, s"decode failed: w=$w h=$h ct=$colorType filters=$filters")
      val expect = colorType match {
        case 0 => Array.tabulate(w * h)(i => pixels(i) & 0xff)
        case 2 => Array.tabulate(w * h) { i =>
          ((pixels(i * 3) & 0xff) << 16) | ((pixels(i * 3 + 1) & 0xff) << 8) | (pixels(i * 3 + 2) & 0xff)
        }
        case 6 => Array.tabulate(w * h) { i =>
          ((pixels(i * 4 + 3) & 0xff) << 24) | ((pixels(i * 4) & 0xff) << 16) |
            ((pixels(i * 4 + 1) & 0xff) << 8) | (pixels(i * 4 + 2) & 0xff)
        }
      }
      assert(decoded.toSeq === expect.toSeq,
        s"pixel mismatch: w=$w h=$h ct=$colorType filters=$filters")
    }
  }

  test("decode rejects what it cannot decode; resize arithmetic is real") {
    // Header-only PNG (no IDAT) and junk bytes both decode to null
    // instead of throwing — the quarantine contract.
    val headerOnly = png(8, 4)
    val df0 = Seq((1L, headerOnly), (2L, "junk".getBytes.asInstanceOf[Array[Byte]]))
      .toDF("img_id", "content")
      .withColumn("pixels", Multimodal.decodeImage(col("content")))
    assert(df0.filter(col("pixels").isNotNull).count() === 0L)
    // Corrupt chunk length near Int.MaxValue must not wrap the
    // bounds check (driver-side kernel calls — no UDF needed).
    val gray = Array.tabulate(32)(i => ((i * 37 + 11) % 256).toByte)
    val corrupt = realPng(8, 4, 0, gray.clone(), Seq(0, 0, 0, 0))
    // IHDR ends at offset 33 (incl. CRC); patch the IDAT length field.
    java.nio.ByteBuffer.wrap(corrupt).putInt(33, 0x7ffffff4)
    assert(Multimodal.decodePng(corrupt) == null, "wrapped chunk bound must reject, not throw")
    // FDICT zlib header (0x78 0x20) must reject, not spin: replace
    // the IDAT payload's first bytes with a preset-dictionary header.
    val fdict = realPng(8, 4, 0, gray, Seq(0, 0, 0, 0))
    fdict(41) = 0x78.toByte; fdict(42) = 0x20.toByte
    assert(Multimodal.decodePng(fdict) == null, "FDICT stream must reject, not hang")
    // Resize over really-decoded pixels: nearest-neighbor (0,0)
    // samples input (0,0).
    val df = Seq((1L, realPng(8, 4, 0, gray, Seq(0, 1, 2, 4)))).toDF("img_id", "content")
      .withColumn("info", Multimodal.imageInfo(col("content")))
      .withColumn("pixels", Multimodal.decodeImage(col("content")))
    val px = df.select("pixels").as[Seq[Int]].head()
    assert(px.length == 32)
    val small = df.select(
      Multimodal.resize(col("pixels"), col("info.width"), col("info.height"), 4, 2).as("r"))
      .as[Seq[Int]].head()
    assert(small.length == 8)
    assert(small.head == px.head)
  }


  test("gray-8 PNG encoder round-trips through the decoder pixel-exactly") {
    val px = Array.tabulate(12 * 5)(i => (i * 7 + 3) % 256)
    val bytes = Multimodal.encodePngGray(px, 12, 5)
    val info = Multimodal.pngInfo(bytes)
    assert(info == Multimodal.PngInfo(12, 5, 8, 0))
    assert(Multimodal.decodePng(bytes).toSeq == px.toSeq)
  }

  /** A 60-bit pattern as a 9×8 gray PNG whose dHash IS the pattern
    * (same walk as the q95 fixture). */
  private def patternPng(pat: Long): Array[Byte] = {
    val px = new Array[Int](9 * 8)
    for (y <- 0 until 8) {
      px(y * 9) = 128
      for (x <- 0 until 8)
        px(y * 9 + x + 1) = px(y * 9 + x) + (if (((pat >>> (y * 8 + x)) & 1L) == 1L) -7 else 7)
    }
    Multimodal.encodePngGray(px, 9, 8)
  }

  test("dHash of a 9x8 gradient image equals its construction pattern") {
    for (pat <- Seq(0L, 0x0ABCDEF123456789L & ((1L << 60) - 1), (1L << 60) - 1)) {
      assert(Multimodal.dHashPng(patternPng(pat)) == pat, f"pattern $pat%x")
    }
    // a flipped pattern bit flips exactly that dHash bit
    val base = 0x123456789ABCDEFL
    assert(java.lang.Long.bitCount(
      Multimodal.dHashPng(patternPng(base)) ^
        Multimodal.dHashPng(patternPng(base ^ (1L << 13)))) == 1)
    assert(Multimodal.dHashPng("not a png".getBytes) == null)
  }

  test("dHash is luma-based: an RGB image hashes like its grayscale twin") {
    // RGB pixels whose luma reproduces a known gradient pattern.
    val pat = 0x5A5A5A5A5A5A5A5L & ((1L << 60) - 1)
    val gray = Multimodal.decodePng(patternPng(pat))
    val rgb = gray.flatMap(v => Array(v.toByte, v.toByte, v.toByte))
    val rgbPng = realPng(9, 8, 2, rgb, Seq.fill(8)(0))
    assert(Multimodal.dHashPng(rgbPng) == pat)
  }

  test("image near-dup pairs: clusters at hamming <= 2, garbage quarantined, cross-cluster apart") {
    // cluster c base pattern; members flip distinct bits; one garbage row
    val baseA = 0x0F0F0F0F0F0F0F0L
    val baseB = 0x70707070707070FL
    val images = Seq(
      (0L, patternPng(baseA)),
      (1L, patternPng(baseA ^ (1L << 13))),
      (2L, patternPng(baseA ^ (1L << 26))),
      (10L, patternPng(baseB)),
      (11L, patternPng(baseB ^ (1L << 39))),
      (99L, "garbage".getBytes)).toDF("img_id", "img")
    val pairs = Multimodal.imageNearDupPairs(images, maxHamming = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((0L, 1L, 1), (0L, 2L, 1), (1L, 2L, 2), (10L, 11L, 1)))
  }

  test("image dedup groups: canonical min-id clusters, singletons preserved") {
    val baseA = 0x0F0F0F0F0F0F0F0L
    val baseB = 0x70707070707070FL
    val images = Seq(
      (5L, patternPng(baseA)),
      (1L, patternPng(baseA ^ (1L << 13))),
      (2L, patternPng(baseA ^ (1L << 26))),
      (10L, patternPng(baseB)),
      (99L, "garbage".getBytes)).toDF("img_id", "img")
    val groups = Multimodal.imageDedupGroups(images, maxHamming = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(groups === Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (5L, 1L, 3L), // cluster canonical = min id 1
      (10L, 10L, 1L),                            // unique content singleton
      (99L, 99L, 1L)))                           // undecodable singleton
  }

  test("sniffImageInfo: JPEG marker walk, GIF87a/89a, BMP top-down, malformed nulls") {
    import Multimodal._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // JPEG: SOI + APP0(16) + RST (standalone, must not consume a
    // length) is illegal mid-stream pre-SOS but the walk skips
    // standalone markers wherever seen + SOF0 with h=0x0010 w=0x0020.
    val jp = hx("FFD8" + "FFE000104A46494600010100000100010000" + "FFD0" +
      "FFC00011" + "08" + "0010" + "0020" + "03" + "011100" + "021101" + "031101")
    assert(sniffImageInfo(jp) === ImageMeta("jpeg", 0x20, 0x10, 8))
    // EOI before SOF, truncated segment, bad first marker -> null.
    assert(jpegInfo(hx("FFD8FFD9")) == null)
    assert(jpegInfo(hx("FFD8FFE0FFFF")) == null)
    assert(jpegInfo(hx("FFD800C0")) == null)
    // ITU T.81 B.1.1.2 fill bytes: runs of 0xFF before a marker are
    // legal padding, not marker 0xFF + bogus length.
    val jpFill = hx("FFD8" + "FFFFFF" + "FFC00011" + "08" + "0010" + "0020" +
      "03" + "011100" + "021101" + "031101")
    assert(jpegInfo(jpFill) === ImageMeta("jpeg", 0x20, 0x10, 8))
    // A stray second SOI mid-stream is malformed -> null.
    assert(jpegInfo(hx("FFD8" + "FFD8" + "FFC0001108001000200301110002110103" +
      "1101")) == null)
    // GIF: both signatures, LE dims, color-resolution bits.
    val gif87 = hx("474946383761" + "3412" + "7856" + "F70000")
    assert(sniffImageInfo(gif87) === ImageMeta("gif", 0x1234, 0x5678, 8))
    assert(gifInfo(hx("474946383861" + "34127856F70000")) == null) // GIF88a
    // BMP: negative (top-down) height reports |height|; 24 bpp.
    val bmp = hx("424D" + "00000000" + "00000000" + "36000000" + "28000000" +
      "40000000" + "D0FFFFFF" + "0100" + "1800") // w=64, h=-48
    assert(sniffImageInfo(bmp) === ImageMeta("bmp", 64, 48, 24))
    // PNG routes through the existing parser with the format tag.
    val png = hx("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000040" + "00000030" + "0802000000" + "DEADBEEF")
    assert(sniffImageInfo(png) === ImageMeta("png", 64, 48, 8))
    assert(sniffImageInfo("not an image".getBytes) == null)
    assert(sniffImageInfo(null) == null)
  }

  test("image header parsers never throw on byte soup, truncations, or mutations") {
    import Multimodal._
    val rnd = new scala.util.Random(11)
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val valid = Seq(
      hx("89504E470D0A1A0A" + "0000000D" + "49484452" +
        "00000040" + "00000030" + "0802000000" + "DEADBEEF"),
      hx("FFD8" + "FFE000104A46494600010100000100010000" + "FFC00011" +
        "08" + "0010" + "0020" + "03" + "011100" + "021101" + "031101"),
      hx("474946383961" + "3412" + "7856" + "F70000"),
      hx("424D" + "00000000" + "00000000" + "36000000" + "28000000" +
        "40000000" + "30000000" + "0100" + "1800"))
    // Random soup: 400 buffers, some seeded with real magics so the
    // walks actually enter their parsers before hitting garbage.
    for (i <- 1 to 400) {
      val len = rnd.nextInt(64)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      if (i % 4 == 0 && len >= 2) { b(0) = 0xff.toByte; b(1) = 0xd8.toByte }
      if (i % 4 == 1 && len >= 6) { "GIF89a".getBytes.copyToArray(b) }
      if (i % 4 == 2 && len >= 2) { b(0) = 'B'; b(1) = 'M' }
      sniffImageInfo(b) // must not throw; any non-null is fine
    }
    // Every truncation prefix of each valid header parses or nulls,
    // never throws.
    for (v <- valid; k <- 0 to v.length) sniffImageInfo(v.take(k))
    // Single-byte mutations of the valid headers.
    for (v <- valid; _ <- 1 to 50) {
      val b = v.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      sniffImageInfo(b)
    }
  }
}

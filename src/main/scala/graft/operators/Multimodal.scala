package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/video assets as opaque binary
  * columns with typed metadata, following the same pattern as the
  * audio family — header-only metadata extraction stays cheap and
  * prunable, full pixel decode is a REAL java.base-only PNG decoder
  * (Inflater + scanline defilter; no image library needed), and
  * per-row transforms batch through executor-side functions.
  */
object Multimodal {

  final case class PngInfo(width: Int, height: Int, bitDepth: Int, colorType: Int)

  private def be32(bytes: Array[Byte], off: Int): Int =
    ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
      ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)

  /** REAL header parse: PNG signature + IHDR chunk (width, height,
    * bit depth, color type) — no image library needed, and metadata
    * queries never touch pixel data. Returns null for non-PNG bytes. */
  def pngInfo(bytes: Array[Byte]): PngInfo = {
    if (bytes == null || bytes.length < 33) return null
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    var i = 0
    while (i < 8) { if (bytes(i) != sig(i)) return null; i += 1 }
    // first chunk must be IHDR: length(4) type(4) data(13)
    if (!(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')) return null
    PngInfo(be32(bytes, 16), be32(bytes, 20), bytes(24) & 0xff, bytes(25) & 0xff)
  }

  private val pngInfoUdf = udf((b: Array[Byte]) => Option(pngInfo(b)))

  /** Header-only image metadata column. */
  def imageInfo(bin: Column): Column = pngInfoUdf(bin)

  /** Format-tagged header metadata for the sniffing parser (r16):
    * the lake-scan shape is a binary column of MIXED formats, so the
    * metadata pass must dispatch on magic bytes, not trust a file
    * extension. bitDepth is bits per sample (PNG/JPEG/GIF) or bits
    * per pixel (BMP — its header has no per-sample field). */
  final case class ImageMeta(format: String, width: Int, height: Int, bitDepth: Int)

  /** REAL JPEG header parse, java.base only: SOI then a marker walk
    * (standalone markers skipped, segments skipped by their 2-byte
    * big-endian length) to the first SOF0–SOF15 frame header
    * (C4/C8/CC are DHT/JPG/DAC, not frames), which carries
    * precision, height, width. Runs of 0xFF FILL bytes before a
    * marker byte are legal padding (ITU T.81 B.1.1.2) and are
    * consumed, not misread as marker 0xFF + bogus length. Returns
    * null on anything malformed — missing SOI, a non-FF byte where a
    * marker must start, a stray second SOI mid-stream, a segment
    * length running past the buffer, or EOI before any SOF. */
  def jpegInfo(b: Array[Byte]): ImageMeta = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return null
      // T.81 B.1.1.2: any marker may be preceded by any number of
      // 0xFF fill bytes — skip the run so b(i+1) is the marker code.
      while (i + 3 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 3 >= b.length) return null
      val m = b(i + 1) & 0xff
      if (m == 0xd8) return null // stray second SOI: malformed
      else if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
      else if (m == 0xd9) return null // EOI before any SOF
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > b.length) return null
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (len < 8) return null
          val prec = b(i + 4) & 0xff
          val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
          val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
          return ImageMeta("jpeg", w, h, prec)
        }
        i += 2 + len
      }
    }
    null
  }

  /** REAL GIF header parse: GIF87a/GIF89a signature + the logical
    * screen descriptor (little-endian u16 dims; color resolution
    * bits from the packed flags byte). */
  def gifInfo(b: Array[Byte]): ImageMeta = {
    if (b == null || b.length < 13) return null
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return null
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    ImageMeta("gif", w, h, ((b(10) & 0x70) >> 4) + 1)
  }

  /** REAL BMP header parse: BM signature + BITMAPINFOHEADER
    * (little-endian i32 dims at offsets 18/22 — |height|, because a
    * negative height only flags top-down row order — u16 bpp at 28). */
  def bmpInfo(b: Array[Byte]): ImageMeta = {
    if (b == null || b.length < 30) return null
    if (!(b(0) == 'B' && b(1) == 'M')) return null
    def le32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    val w = le32(18)
    val h = le32(22)
    val bpp = (b(28) & 0xff) | ((b(29) & 0xff) << 8)
    ImageMeta("bmp", w, math.abs(h), bpp)
  }

  /** Magic-dispatching header parse over a mixed-format binary
    * column: PNG/JPEG/GIF/BMP by signature, null for everything
    * else. Header-only — no pixel data is touched, so a
    * metadata-census scan reads a few dozen bytes per asset. */
  def sniffImageInfo(b: Array[Byte]): ImageMeta = {
    val p = pngInfo(b)
    if (p != null) return ImageMeta("png", p.width, p.height, p.bitDepth)
    val j = jpegInfo(b)
    if (j != null) return j
    val g = gifInfo(b)
    if (g != null) return g
    bmpInfo(b)
  }

  private val sniffUdf = udf((b: Array[Byte]) => Option(sniffImageInfo(b)))

  /** Mixed-format header-only metadata column ([[sniffImageInfo]]). */
  def imageInfoSniffed(bin: Column): Column = sniffUdf(bin)

  /** Bound on decoded pixels per image (16 MPix): a hostile or
    * corrupt header cannot make one row allocate unbounded memory —
    * the same per-row-state discipline as the audio kernels. */
  private val MaxDecodePixels = 1 << 24

  /** REAL PNG pixel decode, java.base only: walks the chunk stream,
    * inflates the concatenated IDAT payload
    * (`java.util.zip.Inflater` — zlib ships in the JDK), and
    * defilters each scanline (filter types 0-4: None/Sub/Up/
    * Average/Paeth, the full non-interlaced set). Supports 8-bit
    * gray (color type 0), RGB (2) and RGBA (6); returns row-major
    * packed ints — gray value, 0xRRGGBB, or 0xAARRGGBB — and null
    * for anything outside that envelope (bad signature, palette/
    * 16-bit/interlaced images, truncated or corrupt IDAT). CRCs are
    * not validated: a flipped payload bit surfaces as inflate
    * failure or wrong pixels, and the decode path is for trusted
    * lake-resident assets, not adversarial input. */
  def decodePng(bytes: Array[Byte]): Array[Int] = {
    val info = pngInfo(bytes)
    if (info == null || info.bitDepth != 8) return null
    val bpp = info.colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case _ => return null
    }
    // IHDR method bytes: compression (26) and filter (27) have only
    // one defined value (0) — a nonzero filter-method image whose
    // per-scanline filter bytes happen to land in 0-4 would otherwise
    // defilter to garbage pixels instead of returning null.
    if (bytes(26) != 0 || bytes(27) != 0) return null
    if (bytes(28) != 0) return null // interlaced (Adam7) unsupported
    val w = info.width
    val h = info.height
    if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) return null
    // Chunk walk: concatenate every IDAT payload (the spec allows
    // the zlib stream to split across chunks at any byte).
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    var end = false
    while (!end && off + 8 <= bytes.length) {
      val len = be32(bytes, off)
      // Long compare: a corrupt length near Int.MaxValue would wrap
      // the Int sum negative and sneak past the bounds check.
      if (len < 0 || off.toLong + 8 + len + 4 > bytes.length) end = true
      else {
        def typeIs(s: String): Boolean =
          bytes(off + 4) == s.charAt(0).toByte && bytes(off + 5) == s.charAt(1).toByte &&
            bytes(off + 6) == s.charAt(2).toByte && bytes(off + 7) == s.charAt(3).toByte
        if (typeIs("IDAT")) idat.write(bytes, off + 8, len)
        if (typeIs("IEND")) end = true
        off += 8 + len + 4 // data + crc (not validated)
      }
    }
    val compressed = idat.toByteArray
    if (compressed.isEmpty) return null
    // Inflate exactly h * (1 + stride) bytes of filtered scanlines.
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(compressed)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // n == 0 while unfinished means truncated input OR a
        // needsDictionary stall (FDICT zlib header — illegal in PNG);
        // either way bail, never spin.
        if (n == 0) return null
        got += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inflater.end()
    if (got < raw.length) return null
    // Defilter in place: each byte's predictors (left, up, upper-left)
    // read the already-reconstructed image, per the PNG spec.
    val img = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowOff = y * (stride + 1) + 1
      val outOff = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + x) & 0xff
        val left = if (x >= bpp) img(outOff + x - bpp) & 0xff else 0
        val up = if (y > 0) img(outOff - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) img(outOff - stride + x - bpp) & 0xff else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return null
        }
        img(outOff + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](w * h)
    var i = 0
    bpp match {
      case 1 =>
        while (i < out.length) { out(i) = img(i) & 0xff; i += 1 }
      case 3 =>
        while (i < out.length) {
          val o = i * 3
          out(i) = ((img(o) & 0xff) << 16) | ((img(o + 1) & 0xff) << 8) | (img(o + 2) & 0xff)
          i += 1
        }
      case 4 =>
        while (i < out.length) {
          val o = i * 4
          out(i) = ((img(o + 3) & 0xff) << 24) | ((img(o) & 0xff) << 16) |
            ((img(o + 1) & 0xff) << 8) | (img(o + 2) & 0xff)
          i += 1
        }
    }
    out
  }

  private val decodePngUdf = udf((b: Array[Byte]) => Option(decodePng(b)))

  /** Real pixel-decode column: row-major packed ints (see
    * [[decodePng]]), null for unsupported/corrupt images — a
    * downstream filter on `isNotNull` is the quarantine step. */
  def decodeImage(bin: Column): Column = decodePngUdf(bin)

  /** Nearest-neighbor resize over a row-major pixel array — real
    * arithmetic over whatever the decode produced. */
  def resize(pixels: Column, w: Column, h: Column, outW: Int, outH: Int): Column = {
    val f = udf((px: Seq[Int], w: Int, h: Int) => {
      if (px == null || w <= 0 || h <= 0) null
      else Array.tabulate(outW * outH) { i =>
        val x = (i % outW) * w / outW
        val y = (i / outW) * h / outH
        px(math.min(px.length - 1, y * w + x))
      }
    })
    f(pixels, w, h)
  }

  /** Minimal gray-8 PNG ENCODER, java.base only (CRC32 + Deflater
    * ship in the JDK): color type 0, bit depth 8, filter 0 per
    * scanline. The sink-side complement of [[decodePng]] — round-trip
    * is spec-pinned — and the fixture generator for the perceptual-
    * hash gate (q95 synthesizes cluster corpora through it). */
  def encodePngGray(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(px != null && w > 0 && h > 0 && px.length >= w * h, "bad pixel buffer")
    // Luma range-check up front: `& 0xff` below would otherwise
    // silently truncate an out-of-range value from a future fixture
    // generator into VALID-looking image data.
    var p = 0
    while (p < w * h) {
      require(px(p) >= 0 && px(p) <= 255, s"luma out of range at $p: ${px(p)}")
      p += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(v: Int): Array[Byte] =
      Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val body = tpe.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0))
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (w + 1)) = 0 // filter: None
      var x = 0
      while (x < w) { raw(y * (w + 1) + 1 + x) = (px(y * w + x) & 0xff).toByte; x += 1 }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zipped = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", zipped.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Perceptual dHash (difference hash) of a PNG, 64 bits: decode,
    * integer luma (`(299r + 587g + 114b) / 1000`; gray passes
    * through, alpha ignored), nearest-neighbor downsample to a 9×8
    * luma grid, one bit per horizontal gradient (`left > right`).
    * All-integer — bit-stable across engines and platforms, which is
    * what lets hamming-threshold dedup hash-gate. Null for anything
    * [[decodePng]] rejects. A 9×8 input is its own grid, so
    * fixture hashes are analytically predictable. */
  def dHashPng(bytes: Array[Byte]): java.lang.Long = {
    val info = pngInfo(bytes)
    val px = decodePng(bytes)
    if (px == null) return null
    val w = info.width
    val h = info.height
    def luma(p: Int): Int = info.colorType match {
      case 0 => p & 0xff
      case _ => (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
    }
    val g = Array.tabulate(8, 9) { (y, x) =>
      luma(px(math.min(h - 1, y * h / 8) * w + math.min(w - 1, x * w / 9)))
    }
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y)(x) > g(y)(x + 1)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  private val dHashUdf = udf((b: Array[Byte]) => Option(dHashPng(b)).map(_.longValue))

  /** Perceptual-hash column: binary PNG → 64-bit dHash (null when
    * undecodable). */
  def dhash64(bin: Column): Column = dHashUdf(bin)

  /** Perceptual image near-dup pairs: every image pair whose dHash
    * differs in ≤ `maxHamming` bits — the image-tier sibling of
    * [[Dedup.simhashNearDupPairs]], riding the SAME signature-level
    * hamming machinery ([[Dedup.hammingNearDupPairs]]): identical
    * hashes collapse to one rep, candidates come from pigeonhole
    * chunk banding (never an uncollapsed all-pairs), verification is
    * one xor+popcount. Undecodable images drop out (null hash); the
    * raw frame serves as the strategy probe so probing never decodes
    * more than the bound. */
  def imageNearDupPairs(images: DataFrame, maxHamming: Int,
                        idCol: String = "img_id", binCol: String = "img"): DataFrame =
    Dedup.hammingNearDupPairs(
      images.select(col(idCol), dhash64(col(binCol)).as("dhash")),
      sigBits = 64, maxHamming = maxHamming, idCol = idCol, sigCol = "dhash",
      repProbe = Some(images))

  /** Image dedup endgame: resolve [[imageNearDupPairs]] into GROUPS
    * — `(img_id, group_id, group_size)` with `group_id` the minimum
    * member id (the canonical pick) — via the same label-propagation
    * components that close the text tier ([[Dedup
    * .connectedComponents]]; at radius ≤ a few bits near-dup is not
    * transitive in general, so the component view is the honest
    * cluster semantics). Images outside every pair — unique content
    * AND undecodable rows — come back as singletons of themselves,
    * so the corpus row count is preserved and the quarantine path
    * stays visible. */
  def imageDedupGroups(images: DataFrame, maxHamming: Int,
                       idCol: String = "img_id", binCol: String = "img"): DataFrame = {
    val comps = Dedup.connectedComponents(imageNearDupPairs(images, maxHamming, idCol, binCol))
    val grouped = images.select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("group_id"))
    grouped.join(
      grouped.groupBy(col("group_id")).agg(count(lit(1)).as("group_size")),
      Seq("group_id"))
      .select(col(idCol), col("group_id"), col("group_size"))
  }

}

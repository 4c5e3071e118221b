package graft.functions

import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[PdfOps]] text extraction on hand-built PDFs (every byte of
  * the fixture is in this file, so the expected text is exact) plus
  * golden checks on the two real TeX-produced PDF 1.5 files shipped
  * with the base system (ObjStm + FlateDecode + xref-stream layout —
  * the modern producer shape).
  */
class PdfSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Assemble a PDF from (objNum, dictSource, streamPayload) parts. */
  private def pdf(objs: (Int, String, Array[Byte])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes("%PDF-1.4\n"))
    for ((num, dict, payload) <- objs) {
      out.write(bytes(s"$num 0 obj\n$dict\n"))
      if (payload != null) {
        out.write(bytes("stream\n"))
        out.write(payload)
        out.write(bytes("\nendstream\n"))
      }
      out.write(bytes("endobj\n"))
    }
    out.write(bytes("trailer\n<< /Root 1 0 R >>\n%%EOF\n"))
    out.toByteArray
  }

  private def contentObj(num: Int, content: String,
                         compress: Boolean = false): (Int, String, Array[Byte]) = {
    val raw = bytes(content)
    val payload = if (compress) deflate(raw) else raw
    val filter = if (compress) " /Filter /FlateDecode" else ""
    (num, s"<< /Length ${payload.length}$filter >>", payload)
  }

  test("uncompressed fixture: Tj, TJ kerns, escapes, hex strings, Td newline, page join") {
    val doc = pdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", null),
      (2, "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>", null),
      (3, "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 6 0 R >> >> /Contents 4 0 R >>", null),
      contentObj(4,
        "BT /F1 12 Tf 72 720 Td (Hello) Tj [(, ) (world) -250 (again)] TJ " +
          "0 -14 Td (Line2 \\050paren\\051) Tj <48495A> Tj ET"),
      (5, "<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>", null),
      (6, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", null),
      contentObj(7, "BT (Page two) Tj ET"))
    val got = PdfOps.extractText(doc)
    assert(got === "Hello, world again\nLine2 (paren)HIZ Page two")
  }

  test("FlateDecode content stream with an indirect /Length") {
    val payload = deflate(bytes("BT (compressed text stream) Tj ET"))
    val doc = pdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", null),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", null),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", null),
      (4, s"<< /Length 5 0 R /Filter /FlateDecode >>", payload),
      (5, s"${payload.length}", null))
    assert(PdfOps.extractText(doc) === "compressed text stream")
  }

  test("ToUnicode CMap: bfchar + bfrange over 2-byte codes decode to Unicode") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |2 beginbfchar
        |<0001> <0056>
        |<0002> <1EC7>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <0061>
        |endbfrange
        |endcmap
        |""".stripMargin
    val doc = pdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", null),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", null),
      (3, "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F9 5 0 R >> >> /Contents 4 0 R >>", null),
      contentObj(4, "BT /F9 10 Tf <000100020010 00110012> Tj ET"),
      (5, "<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>", null),
      (6, s"<< /Length ${cmap.length} >>", bytes(cmap)))
    // 0001→V, 0002→U+1EC7 (ệ), 0010..0012→a,b,c
    assert(PdfOps.extractText(doc) === "Vệabc")
  }

  test("PDF 1.5 object stream: page tree inside a compressed ObjStm is found") {
    val embedded =
      "<< /Type /Catalog /Pages 2 0 R >> " +
        "<< /Type /Pages /Kids [3 0 R] /Count 1 >> " +
        "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val off2 = embedded.indexOf("<< /Type /Pages")
    val off3 = embedded.indexOf("<< /Type /Page /Parent")
    val header = s"1 0 2 $off2 3 $off3 "
    val stmData = bytes(header + embedded)
    val packed = deflate(stmData)
    val doc = pdf(
      (9, s"<< /Type /ObjStm /N 3 /First ${header.length} /Length ${packed.length} /Filter /FlateDecode >>", packed),
      contentObj(4, "BT (from an object stream) Tj ET"))
    assert(PdfOps.extractText(doc) === "from an object stream")
  }

  test("golden: real TeX-produced PDF 1.5 manuals extract readable text") {
    val files = Seq(
      ("/usr/share/doc/libtasn1-doc/libtasn1.pdf",
        Seq("Abstract Syntax Notation One", "Libtasn1", "DER")),
      ("/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf",
        Seq("Shared MIME-info Database", "freedesktop", "MIME")))
    for ((path, expect) <- files) {
      val f = new java.io.File(path)
      assume(f.exists(), s"golden file $path not present on this system")
      val txt = PdfOps.extractText(java.nio.file.Files.readAllBytes(f.toPath))
      assert(txt.length > 10000, s"$path extracted only ${txt.length} chars")
      for (s <- expect) assert(txt.contains(s), s"$path text lacks '$s'")
      // Mostly printable: a broken decode shows up as replacement/control soup.
      val printable = txt.count(c => c >= ' ' || c == '\n' || c == '\t')
      assert(printable.toDouble / txt.length > 0.99)
    }
  }

  test("malformed inputs never throw: garbage, truncation, empty, non-PDF") {
    assert(PdfOps.extractText(Array.emptyByteArray) === "")
    assert(PdfOps.extractText(bytes("not a pdf at all")) === "")
    assert(PdfOps.extractText(bytes("%PDF-1.4\ngarbage")) === "")
    val ok = pdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", null),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", null),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", null),
      contentObj(4, "BT (x) Tj ET"))
    for (cut <- Seq(10, ok.length / 2, ok.length - 5)) {
      val t = PdfOps.extractText(java.util.Arrays.copyOf(ok, cut))
      assert(t != null) // partial text or "" — must not throw
    }
  }

  test("damaged streams: long stray-closer runs and image-heavy pages stay linear, no overflow") {
    // A ~200k run of ']' bytes used to recurse once per byte in
    // Lexer.next() — StackOverflowError degraded the document to "".
    val closers = "]".repeat(200000)
    val doc = pdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", null),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", null),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", null),
      contentObj(4, s"BT (before) Tj $closers (after) Tj ET"))
    val t = PdfOps.extractText(doc)
    assert(t.contains("before") && t.contains("after"), t.take(200))
    // Many BI..EI inline images in one stream: the skip must be a
    // byte-level scan (the String-copy version was O(n²) here) and
    // text between images survives.
    val imgs = (1 to 2000).map(i => s"BI /W 1 /H 1 ID  EI (t$i) Tj").mkString(" ")
    val doc2 = pdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", null),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", null),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", null),
      contentObj(4, s"BT $imgs ET"))
    val t2 = PdfOps.extractText(doc2)
    assert(t2.contains("t1") && t2.contains("t2000"), t2.take(200))
  }

  test("fuzz: mutated/truncated/spliced PDFs never throw and never hang") {
    // Deterministic corpus: a valid multi-object PDF (with a Flate
    // stream and an ObjStm) mutated by byte flips, truncations, block
    // splices, and duplications — the lax-parse law is "best-effort
    // text or empty, never an exception" (the ParserFuzzSpec
    // convention applied to the container format).
    val packed = deflate(bytes("1 0 2 34 << /Type /Catalog /Pages 2 0 R >> << /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    val base = pdf(
      (9, s"<< /Type /ObjStm /N 2 /First 7 /Length ${packed.length} /Filter /FlateDecode >>", packed),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", null),
      contentObj(4, "BT (fuzz seed text) Tj [(a) -300 (b)] TJ ET", compress = true))
    val rnd = new scala.util.Random(42)
    var nonEmpty = 0
    for (i <- 0 until 300) {
      val b = base.clone()
      rnd.nextInt(4) match {
        case 0 => // flip 1-8 bytes
          for (_ <- 0 to rnd.nextInt(8)) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        case 1 => // truncate
          val cut = 1 + rnd.nextInt(b.length - 1)
          val t = java.util.Arrays.copyOf(b, cut)
          val txt = PdfOps.extractText(t)
          assert(txt != null)
        case 2 => // splice a random block elsewhere
          val from = rnd.nextInt(b.length); val len = math.min(rnd.nextInt(64), b.length - from)
          val to = rnd.nextInt(b.length - math.max(len, 1) + 1)
          System.arraycopy(base, from, b, to, len)
        case 3 => // duplicate the whole document (two bodies, one magic)
          val t = base ++ base
          assert(PdfOps.extractText(t) != null)
      }
      val txt = PdfOps.extractText(b)
      assert(txt != null, s"fuzz case $i threw/returned null")
      if (txt.nonEmpty) nonEmpty += 1
    }
    // sanity: the fuzzer isn't vacuous — plenty of mutants still parse
    assert(nonEmpty > 50, s"only $nonEmpty mutants produced text — fuzz corpus degenerate")
  }

  test("isPdf detects the magic only") {
    assert(PdfOps.isPdf(bytes("%PDF-1.7 rest")))
    assert(!PdfOps.isPdf(bytes("PDF-1.7")))
    assert(!PdfOps.isPdf(null))
    assert(!PdfOps.isPdf(bytes("%PD")))
  }

  test("unsupported features route to null, never throw: encrypted trailer, LZW filter") {
    // Structurally-valid document whose trailer declares /Encrypt —
    // the r15→r17 S9 gap: extraction must route it to NULL, not
    // return silently-garbled text, and must not throw.
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes("%PDF-1.4\n"))
    out.write(bytes("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"))
    out.write(bytes("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"))
    out.write(bytes("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"))
    val enc = bytes("Þ­ (enciphered payload) ¾ï")
    out.write(bytes(s"4 0 obj\n<< /Length ${enc.length} >>\nstream\n"))
    out.write(enc); out.write(bytes("\nendstream\nendobj\n"))
    out.write(bytes("5 0 obj\n<< /Filter /Standard /V 2 /R 3 /O (o) /U (u) /P -44 >>\nendobj\n"))
    out.write(bytes("trailer\n<< /Root 1 0 R /Encrypt 5 0 R >>\n%%EOF\n"))
    val encDoc = out.toByteArray
    assert(PdfOps.unsupportedFeature(encDoc) === Some("encrypted"))
    assert(PdfOps.extractTextOrNull(encDoc) == null)
    PdfOps.extractText(encDoc) // best-effort path still must not throw
    // Undecodable content-stream filter: flagged by name.
    val lzw = pdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", null),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", null),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", null),
      (4, "<< /Length 4 /Filter /LZWDecode >>", Array[Byte](-128, 11, 96, 80)))
    assert(PdfOps.unsupportedFeature(lzw) === Some("filter:LZWDecode"))
    assert(PdfOps.extractTextOrNull(lzw) == null)
    // Image-only filters are NOT unsupported: text extraction skips
    // image streams, so a photo-bearing doc still extracts.
    val dct = pdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", null),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", null),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", null),
      contentObj(4, "BT (visible) Tj ET"),
      (5, "<< /Subtype /Image /Filter /DCTDecode /Length 0 >>", Array.emptyByteArray))
    assert(PdfOps.unsupportedFeature(dct) === None)
    assert(PdfOps.extractTextOrNull(dct) === "visible")
    // Name-token discipline: a LONGER name sharing the prefix must
    // not false-positive the sniff.
    val prefixed = pdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", null),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", null),
      (3, "<< /Type /Page /Parent 2 0 R /Encrypted true /Contents 4 0 R >>", null),
      contentObj(4, "BT (clean) Tj ET"))
    assert(PdfOps.unsupportedFeature(prefixed) === None)
    assert(PdfOps.extractTextOrNull(prefixed) === "clean")
    // Non-PDF bytes: null, not a throw.
    assert(PdfOps.extractTextOrNull(bytes("just text")) == null)
    assert(PdfOps.extractTextOrNull(null) == null)
  }
}

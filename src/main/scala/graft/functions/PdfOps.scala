package graft.functions

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

import scala.collection.mutable

/** Pure-JVM PDF text extraction (reference S9,
  * `pre_processing/process_all.py:265-279`, which uses PyMuPDF's
  * `page.get_text()` and joins pages with a space).
  *
  * Scope — the subset a text-pipeline extractor actually needs, with
  * no native library:
  *  - object scan by header (`N G obj`), so damaged/absent xref
  *    tables don't matter;
  *  - streams: `/Length` direct or indirect, `endstream` fallback;
  *    FlateDecode (java.util.zip) with PNG predictors;
  *  - PDF 1.5 object streams (`/Type /ObjStm`), which is where
  *    modern producers (TeX, word processors) put the page tree;
  *  - page tree walk from the catalog (resource inheritance down
  *    `/Pages` nodes), falling back to `/Type /Page` objects in
  *    object order;
  *  - content-stream text operators: `Tj`, `TJ` (kern-to-space
  *    heuristic), `'`, `"`, `Td`/`TD`/`T*`/`Tm` line breaks, `BT`/
  *    `ET`, inline-image skip;
  *  - string decode per current font: `/ToUnicode` CMaps
  *    (`bfchar`/`bfrange`, code width from the codespace range),
  *    UTF-16BE for CMap-less Type0, Latin-1 for simple fonts
  *    (≡ WinAnsi on the ASCII range).
  *
  * Not covered (documented approximation, same spirit as F7): font
  * program parsing for custom Type1 encodings (TeX ligature glyphs
  * like fi/fl decode as their builtin codes), form-XObject recursion,
  * and encrypted files (extract returns what it can, typically "").
  * Extraction never throws: any structural surprise degrades to the
  * text recovered so far.
  */
object PdfOps {

  def isPdf(b: Array[Byte]): Boolean =
    b != null && b.length >= 5 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' &&
      b(3) == 'F' && b(4) == '-'

  // ---------------------------------------------------------------
  // Object model
  // ---------------------------------------------------------------
  private sealed trait PVal
  private final case class PNum(v: Double) extends PVal { def i: Int = v.toInt }
  private final case class PStr(bytes: Array[Byte]) extends PVal
  private final case class PName(v: String) extends PVal
  private final case class PArr(items: Vector[PVal]) extends PVal
  private final case class PDict(m: Map[String, PVal]) extends PVal
  private final case class PRef(num: Int) extends PVal
  private final case class POp(name: String) extends PVal
  private case object PNull extends PVal

  // ---------------------------------------------------------------
  // Lexer / recursive-descent parser over a byte window
  // ---------------------------------------------------------------
  private final class Lexer(val b: Array[Byte], var pos: Int, val end: Int) {
    private def isWs(c: Int) =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0 || c == '\f'
    private def isDelim(c: Int) =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%'
    def atEnd: Boolean = pos >= end
    def peek: Int = if (pos < end) b(pos) & 0xff else -1
    private def peek2: Int = if (pos + 1 < end) b(pos + 1) & 0xff else -1

    def skipWs(): Unit = {
      var go = true
      while (go && pos < end) {
        val c = b(pos) & 0xff
        if (isWs(c)) pos += 1
        else if (c == '%') { while (pos < end && b(pos) != '\n' && b(pos) != '\r') pos += 1 }
        else go = false
      }
    }

    private def hexVal(c: Int): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1

    private def name(): PName = { // pos at '/'
      pos += 1
      val sb = new java.lang.StringBuilder
      while (pos < end && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff)) {
        val c = b(pos) & 0xff
        if (c == '#' && pos + 2 < end && hexVal(b(pos + 1) & 0xff) >= 0 && hexVal(b(pos + 2) & 0xff) >= 0) {
          sb.append(((hexVal(b(pos + 1) & 0xff) << 4) | hexVal(b(pos + 2) & 0xff)).toChar)
          pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def literalString(): PStr = { // pos at '('
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (pos < end && depth > 0) {
        val c = b(pos) & 0xff
        if (c == '\\' && pos + 1 < end) {
          val e = b(pos + 1) & 0xff
          pos += 2
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case '\r' => if (pos < end && b(pos) == '\n') pos += 1 // line continuation
            case '\n' => ()
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'; var k = 0
              while (k < 2 && pos < end && b(pos) >= '0' && b(pos) <= '7') {
                v = v * 8 + (b(pos) - '0'); pos += 1; k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other)
          }
        } else {
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          if (depth > 0) out.write(c)
          pos += 1
        }
      }
      PStr(out.toByteArray)
    }

    private def hexString(): PStr = { // pos at '<', not '<<'
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (pos < end && b(pos) != '>') {
        val v = hexVal(b(pos) & 0xff)
        if (v >= 0) { if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 } }
        pos += 1
      }
      if (hi >= 0) out.write(hi << 4) // odd count: pad 0
      if (pos < end) pos += 1 // '>'
      PStr(out.toByteArray)
    }

    private def number(): PNum = {
      val start = pos
      if (peek == '+' || peek == '-') pos += 1
      while (pos < end && ((b(pos) >= '0' && b(pos) <= '9') || b(pos) == '.')) pos += 1
      val s = new String(b, start, pos - start, StandardCharsets.ISO_8859_1)
      PNum(try s.toDouble catch { case _: NumberFormatException => 0d })
    }

    private def keyword(): PVal = {
      val start = pos
      while (pos < end && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff)) pos += 1
      new String(b, start, pos - start, StandardCharsets.ISO_8859_1) match {
        case "true" => PNum(1)
        case "false" => PNum(0)
        case "null" => PNull
        case op => POp(op)
      }
    }

    /** One value. Integers followed by `int R` collapse to [[PRef]]. */
    def next(): PVal = {
      skipWs()
      // Stray closers skip ITERATIVELY: recursing once per byte made
      // a damaged stream with a long run of ']'/')' bytes throw
      // StackOverflowError and degrade the whole document to "".
      while (!atEnd && {
        val c = peek
        c == ']' || c == '>' || c == ')' || c == '}' || c == '{'
      }) { pos += 1; skipWs() }
      if (atEnd) return PNull
      val c = peek
      if (c == '/') name()
      else if (c == '(') literalString()
      else if (c == '<' && peek2 == '<') { pos += 2; dict() }
      else if (c == '<') hexString()
      else if (c == '[') { pos += 1; array() }
      else if (c >= '0' && c <= '9' || c == '+' || c == '-' || c == '.') {
        val n = number()
        if (n.v >= 0 && n.v == math.floor(n.v)) {
          val save = pos
          skipWs()
          if (peek >= '0' && peek <= '9') {
            number()
            skipWs()
            if (peek == 'R' && { val a = if (pos + 1 < end) b(pos + 1) & 0xff else ' '; isWs(a) || isDelim(a) || pos + 1 >= end }) {
              pos += 1
              return PRef(n.v.toInt)
            }
          }
          pos = save
        }
        n
      } else keyword()
    }

    private def array(): PArr = {
      val items = Vector.newBuilder[PVal]
      var go = true
      while (go) {
        skipWs()
        if (atEnd || peek == ']') { if (!atEnd) pos += 1; go = false }
        else items += next()
      }
      PArr(items.result())
    }

    private def dict(): PDict = {
      val m = Map.newBuilder[String, PVal]
      var go = true
      while (go) {
        skipWs()
        if (atEnd) go = false
        else if (peek == '>' && peek2 == '>') { pos += 2; go = false }
        else next() match {
          case PName(k) => m += k -> next()
          case _ => () // malformed key: skip
        }
      }
      PDict(m.result())
    }

    /** True and consumes if the next token is exactly `kw`. */
    def tryKeyword(kw: String): Boolean = {
      skipWs()
      val n = kw.length
      if (pos + n <= end && new String(b, pos, n, StandardCharsets.ISO_8859_1) == kw) {
        val after = if (pos + n < end) b(pos + n) & 0xff else ' '
        if (isWs(after) || isDelim(after) || pos + n >= end) { pos += n; true } else false
      } else false
    }
  }

  // ---------------------------------------------------------------
  // Document parse: objects, streams, object streams
  // ---------------------------------------------------------------
  private final case class PObj(value: PVal, streamAt: Int)

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    try {
      var go = true
      while (go && !inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) go = false
      }
      out.toByteArray
    } catch { case _: Throwable => out.toByteArray } finally inf.end()
  }

  /** PNG predictor un-filter (predictor >= 10): rows of `columns`
    * bytes, one filter-type byte per row. */
  private def pngUnpredict(data: Array[Byte], columns: Int): Array[Byte] = {
    val rowLen = columns
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i > 0) out(dst + i - 1) & 0xff else 0
        val up = if (r > 0) out(dst - rowLen + i) & 0xff else 0
        val ul = if (r > 0 && i > 0) out(dst - rowLen + i - 1) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => raw
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private final class Doc(bytes: Array[Byte]) {
    private val latin1 = new String(bytes, StandardCharsets.ISO_8859_1)
    val objects = mutable.Map.empty[Int, PObj]

    // Pass 1: every `N G obj` header in document order. Matches that
    // fall inside a previous object's stream payload (compressed bytes
    // can spell anything) are skipped via the running `skipUntil`
    // high-water mark.
    locally {
      val m = java.util.regex.Pattern
        .compile("(?<![0-9])(\\d{1,9})\\s+(\\d{1,5})\\s+obj\\b").matcher(latin1)
      var skipUntil = -1
      while (m.find()) {
        if (m.start() >= skipUntil) {
        val num = m.group(1).toInt
        val lx = new Lexer(bytes, m.end(), bytes.length)
        val v = try lx.next() catch { case _: Throwable => PNull }
        val streamAt =
          if (try lx.tryKeyword("stream") catch { case _: Throwable => false }) {
            var p = lx.pos
            if (p < bytes.length && bytes(p) == '\r') p += 1
            if (p < bytes.length && bytes(p) == '\n') p += 1
            p
          } else -1
        objects.put(num, PObj(v, streamAt))
        if (streamAt >= 0) {
          val e = latin1.indexOf("endstream", streamAt)
          if (e > skipUntil) skipUntil = e
        }
        }
      }
    }

    def resolve(v: PVal, depth: Int = 0): PVal = v match {
      case PRef(n) if depth < 32 =>
        objects.get(n).map(o => resolve(o.value, depth + 1)).getOrElse(PNull)
      case other => other
    }
    private def dictOf(v: PVal): Map[String, PVal] =
      resolve(v) match { case PDict(m) => m; case _ => Map.empty }

    /** Decoded stream payload of object `num`, or null. */
    def streamData(num: Int): Array[Byte] = {
      val o = objects.getOrElse(num, return null)
      if (o.streamAt < 0) return null
      val d = dictOf(o.value)
      val len = resolve(d.getOrElse("Length", PNull)) match {
        case PNum(n) if n >= 0 && o.streamAt + n <= bytes.length => n.toInt
        case _ =>
          val e = latin1.indexOf("endstream", o.streamAt)
          if (e < 0) return null
          var stop = e
          if (stop > o.streamAt && bytes(stop - 1) == '\n') stop -= 1
          if (stop > o.streamAt && bytes(stop - 1) == '\r') stop -= 1
          stop - o.streamAt
      }
      var data = java.util.Arrays.copyOfRange(bytes, o.streamAt, o.streamAt + len)
      val filters = resolve(d.getOrElse("Filter", PNull)) match {
        case PName(f) => Seq(f)
        case PArr(fs) => fs.map(resolve(_)).collect { case PName(f) => f }
        case _ => Seq.empty
      }
      val parms = resolve(d.getOrElse("DecodeParms", PNull)) match {
        case p: PDict => Seq(p)
        case PArr(ps) => ps.map(resolve(_)).collect { case p: PDict => p }
        case _ => Seq.empty
      }
      filters.zipWithIndex.foreach { case (f, i) =>
        f match {
          case "FlateDecode" | "Fl" =>
            data = inflate(data)
            val pm = parms.lift(i).map(_.m).getOrElse(Map.empty)
            val pred = resolve(pm.getOrElse("Predictor", PNum(1))) match { case PNum(n) => n.toInt; case _ => 1 }
            if (pred >= 10) {
              val cols = resolve(pm.getOrElse("Columns", PNum(1))) match { case PNum(n) => n.toInt.max(1); case _ => 1 }
              data = pngUnpredict(data, cols)
            }
          case _ => () // unsupported filter (DCT etc.): leave as-is
        }
      }
      data
    }

    // Pass 2: expand PDF 1.5 object streams so page trees inside them
    // become visible.
    locally {
      val objStms = objects.collect {
        case (num, o) if o.streamAt >= 0 &&
          (dictOf(o.value).get("Type") match { case Some(PName("ObjStm")) => true; case _ => false }) => num
      }.toSeq.sorted
      for (num <- objStms) {
        try {
          val d = dictOf(objects(num).value)
          val n = resolve(d.getOrElse("N", PNull)) match { case PNum(x) => x.toInt; case _ => 0 }
          val first = resolve(d.getOrElse("First", PNull)) match { case PNum(x) => x.toInt; case _ => 0 }
          val data = streamData(num)
          if (data != null && n > 0 && first > 0 && first <= data.length) {
            val hdr = new Lexer(data, 0, first)
            val pairs = (0 until n).flatMap { _ =>
              (hdr.next(), hdr.next()) match {
                case (PNum(on), PNum(off)) => Some((on.toInt, off.toInt))
                case _ => None
              }
            }
            for ((objNum, off) <- pairs if first + off < data.length)
              if (!objects.contains(objNum)) {
                val v = try new Lexer(data, first + off, data.length).next()
                        catch { case _: Throwable => PNull }
                objects.put(objNum, PObj(v, -1))
              }
          }
        } catch { case _: Throwable => () }
      }
    }
  }

  // ---------------------------------------------------------------
  // Fonts: code → unicode decoders
  // ---------------------------------------------------------------
  private type FontDecoder = Array[Byte] => String

  private val latin1Decoder: FontDecoder =
    b => new String(b, StandardCharsets.ISO_8859_1)
  private val utf16Decoder: FontDecoder =
    b => new String(b, StandardCharsets.UTF_16BE)

  private def cmapDecoder(cmap: Array[Byte]): FontDecoder = {
    val lx = new Lexer(cmap, 0, cmap.length)
    val map = mutable.Map.empty[Int, String]
    var codeLen = 0
    def codeOf(s: Array[Byte]): Int = {
      var v = 0; var i = 0
      while (i < s.length) { v = (v << 8) | (s(i) & 0xff); i += 1 }
      v
    }
    def utf16(s: Array[Byte]) = new String(s, StandardCharsets.UTF_16BE)
    var state = 0 // 0 none, 1 codespace, 2 bfchar, 3 bfrange
    val pending = mutable.ArrayBuffer.empty[PVal]
    var guard = 0
    while (!lx.atEnd && guard < 1000000) {
      guard += 1
      lx.next() match {
        case POp("begincodespacerange") => state = 1; pending.clear()
        case POp("beginbfchar") => state = 2; pending.clear()
        case POp("beginbfrange") => state = 3; pending.clear()
        case POp(op) if op.startsWith("end") => state = 0; pending.clear()
        case POp(_) => () // stray keyword (findresource/begin/def/…)
        case v =>
          if (state == 1) v match {
            case PStr(s) => codeLen = math.max(codeLen, s.length)
            case _ => ()
          } else if (state == 2) {
            pending += v
            if (pending.length == 2) {
              (pending(0), pending(1)) match {
                case (PStr(src), PStr(dst)) =>
                  if (codeLen == 0) codeLen = src.length
                  map.put(codeOf(src), utf16(dst))
                case _ => ()
              }
              pending.clear()
            }
          } else if (state == 3) {
            pending += v
            if (pending.length == 3) {
              (pending(0), pending(1), pending(2)) match {
                case (PStr(lo), PStr(hi), PStr(dst)) =>
                  if (codeLen == 0) codeLen = lo.length
                  val l = codeOf(lo); val h = codeOf(hi)
                  val base = utf16(dst)
                  var c = l
                  while (c <= h && c - l < 65536) {
                    val s =
                      if (base.isEmpty) ""
                      else base.substring(0, base.length - 1) +
                        (base.charAt(base.length - 1) + (c - l)).toChar
                    map.put(c, s); c += 1
                  }
                case (PStr(lo), PStr(hi), PArr(ds)) =>
                  if (codeLen == 0) codeLen = lo.length
                  val l = codeOf(lo); val h = codeOf(hi)
                  var c = l
                  while (c <= h && c - l < ds.length) {
                    ds(c - l) match { case PStr(d) => map.put(c, utf16(d)); case _ => () }
                    c += 1
                  }
                case _ => ()
              }
              pending.clear()
            }
          }
      }
    }
    val w = if (codeLen <= 0) 1 else codeLen
    bytesIn => {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + w <= bytesIn.length) {
        var v = 0; var k = 0
        while (k < w) { v = (v << 8) | (bytesIn(i + k) & 0xff); k += 1 }
        map.get(v) match {
          case Some(s) => sb.append(s)
          case None => sb.append((if (w == 1) v.toChar else '�'))
        }
        i += w
      }
      sb.toString
    }
  }

  // ---------------------------------------------------------------
  // Page walk + content-stream text extraction
  // ---------------------------------------------------------------
  def extractText(pdf: Array[Byte]): String = {
    if (!isPdf(pdf)) return ""
    try extractUnsafe(pdf) catch { case _: Throwable => "" }
  }

  private def extractUnsafe(pdf: Array[Byte]): String = {
    val doc = new Doc(pdf)
    import doc.{objects, resolve, streamData}
    def asDict(v: PVal): Map[String, PVal] =
      resolve(v) match { case PDict(m) => m; case _ => Map.empty }

    // Page list in tree order, with inherited resources.
    val pages = mutable.ArrayBuffer.empty[(Map[String, PVal], Map[String, PVal])]
    val visited = mutable.Set.empty[Int]
    def walk(node: PVal, inheritedRes: Map[String, PVal]): Unit = {
      node match { case PRef(n) => if (!visited.add(n)) return; case _ => () }
      val d = asDict(node)
      val res = asDict(d.getOrElse("Resources", PNull)) match {
        case m if m.nonEmpty => m
        case _ => inheritedRes
      }
      d.get("Type") match {
        case Some(PName("Pages")) =>
          resolve(d.getOrElse("Kids", PNull)) match {
            case PArr(kids) => kids.foreach(walk(_, res))
            case _ => ()
          }
        case Some(PName("Page")) => pages += ((d, res))
        case _ => ()
      }
    }
    val catalog = objects.toSeq.sortBy(_._1).iterator.map(_._2.value).find {
      v => asDict(v).get("Type").contains(PName("Catalog"))
    }
    catalog.flatMap(c => asDict(c).get("Pages")).foreach(walk(_, Map.empty))
    if (pages.isEmpty)
      objects.toSeq.sortBy(_._1).foreach { case (_, o) =>
        val d = asDict(o.value)
        if (d.get("Type").contains(PName("Page"))) pages += ((d, asDict(d.getOrElse("Resources", PNull))))
      }

    val pageTexts = pages.map { case (page, res) =>
      // Per-page font name → decoder.
      val fonts: Map[String, FontDecoder] =
        asDict(res.getOrElse("Font", PNull)).map { case (fname, fref) =>
          val fd = asDict(fref)
          val dec = fd.get("ToUnicode") match {
            case Some(PRef(n)) =>
              val cm = streamData(n)
              if (cm != null) cmapDecoder(cm)
              else if (fd.get("Subtype").contains(PName("Type0"))) utf16Decoder
              else latin1Decoder
            case _ =>
              if (fd.get("Subtype").contains(PName("Type0"))) utf16Decoder
              else latin1Decoder
          }
          fname -> dec
        }
      val content: Array[Byte] = resolve(page.getOrElse("Contents", PNull)) match {
        case PArr(cs) =>
          val parts = cs.collect { case PRef(n) => streamData(n) }.filter(_ != null)
          if (parts.isEmpty) Array.emptyByteArray
          else parts.reduce((a, b) => a ++ Array[Byte]('\n') ++ b)
        case _ =>
          page.get("Contents") match {
            case Some(PRef(n)) => Option(streamData(n)).getOrElse(Array.emptyByteArray)
            case _ => Array.emptyByteArray
          }
      }
      extractFromContent(content, fonts)
    }
    // Reference joins page texts with a single space
    // (process_all.py:276 `" ".join(text_parts)`).
    pageTexts.map(_.trim).filter(_.nonEmpty).mkString(" ")
  }

  /** Text from one page's (decoded) content stream. */
  private def extractFromContent(content: Array[Byte],
                                 fonts: Map[String, FontDecoder]): String = {
    val lx = new Lexer(content, 0, content.length)
    val sb = new java.lang.StringBuilder
    val operands = mutable.ArrayBuffer.empty[PVal]
    var decoder: FontDecoder = latin1Decoder
    var lastTmY = Double.NaN
    def newline(): Unit =
      if (sb.length > 0 && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    def show(v: PVal): Unit = v match {
      case PStr(s) => sb.append(decoder(s))
      case _ => ()
    }
    var guard = 0
    while (!lx.atEnd && guard < 10000000) {
      guard += 1
      lx.next() match {
        case POp("Tj") => operands.lastOption.foreach(show); operands.clear()
        case POp("TJ") =>
          operands.lastOption match {
            case Some(PArr(items)) =>
              items.foreach {
                case s: PStr => show(s)
                // kern in thousandths of an em; a gap wider than
                // ~0.18 em reads as an inter-word space (pdftotext's
                // heuristic family)
                case PNum(n) if n < -180 =>
                  if (sb.length > 0 && sb.charAt(sb.length - 1) != ' ') sb.append(' ')
                case _ => ()
              }
            case _ => ()
          }
          operands.clear()
        case POp("'") =>
          newline(); operands.lastOption.foreach(show); operands.clear()
        case POp("\"") =>
          newline(); operands.lastOption.foreach(show); operands.clear()
        case POp("Tf") =>
          operands.headOption match {
            case Some(PName(f)) => decoder = fonts.getOrElse(f, latin1Decoder)
            case _ => ()
          }
          operands.clear()
        case POp("Td") | POp("TD") =>
          operands.lastOption match {
            case Some(PNum(ty)) if ty != 0 => newline()
            case _ => if (sb.length > 0 && sb.charAt(sb.length - 1) != ' ' && sb.charAt(sb.length - 1) != '\n') sb.append(' ')
          }
          operands.clear()
        case POp("T*") => newline(); operands.clear()
        case POp("Tm") =>
          if (operands.length >= 6) {
            operands(5) match {
              case PNum(y) =>
                if (!lastTmY.isNaN && y != lastTmY) newline()
                lastTmY = y
              case _ => ()
            }
          }
          operands.clear()
        case POp("BT") => operands.clear()
        case POp("ET") => operands.clear()
        case POp("BI") =>
          // inline image: byte-level scan for the EI terminator —
          // copying the whole remaining stream into a String per BI
          // occurrence was O(n²) on image-heavy pages.
          var i = lx.pos
          var found = -1
          while (found < 0 && i + 1 < lx.end) {
            if (lx.b(i) == 'E' && lx.b(i + 1) == 'I') found = i
            i += 1
          }
          lx.pos = if (found < 0) lx.end else found + 2
          operands.clear()
        case POp(_) => operands.clear()
        case v => operands += v
      }
    }
    sb.toString
  }
}

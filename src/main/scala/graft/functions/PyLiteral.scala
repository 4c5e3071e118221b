package graft.functions

/** Recursive-descent parser for Python literal expressions embedded
  * in CSV cells — the reference persists `narrator` (dict or
  * list-of-dict) and `audio_download_url` (list of str) as
  * `repr()` strings and reads them back with `ast.literal_eval`
  * (`crawler/download.py:223-230`, `crawler/metadata.py:261-266`,
  * `__init__.py:290-296`).
  *
  * We parse the literal into canonical JSON text so callers can
  * finish with Spark's native `from_json` and a proper schema:
  * {{{
  *   from_json(pyliteral_to_json($"narrator"), narratorArraySchema)
  * }}}
  *
  * Supported: str ('…' / "…" with backslash escapes), int, float,
  * True/False/None, lists, tuples (→ JSON arrays), dicts. Returns
  * null on any malformed input — mirroring the reference's
  * `except → None` tolerance (`__init__.py:72-73`).
  */
object PyLiteral {

  def toJson(s: String): String = {
    if (s == null) return null
    val p = new Parser(s)
    try {
      p.skipWs()
      val sb = new StringBuilder
      p.parseValue(sb)
      p.skipWs()
      if (p.pos != s.length) null else sb.toString
    } catch {
      case _: ParseError => null
    }
  }

  private final class ParseError extends RuntimeException

  private final class Parser(s: String) {
    var pos = 0

    def fail(): Nothing = throw new ParseError

    def skipWs(): Unit = {
      while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1
    }

    def peek: Char = if (pos < s.length) s.charAt(pos) else fail()

    def expect(c: Char): Unit = {
      if (pos >= s.length || s.charAt(pos) != c) fail()
      pos += 1
    }

    def parseValue(sb: StringBuilder): Unit = {
      skipWs()
      peek match {
        case '\'' | '"' => parseString(sb)
        case '['        => parseSeq(sb, '[', ']')
        case '('        => parseSeq(sb, '(', ')')
        case '{'        => parseDict(sb)
        case c if c == 'N' && s.startsWith("None", pos)  => { pos += 4; sb.append("null") }
        case c if c == 'T' && s.startsWith("True", pos)  => { pos += 4; sb.append("true") }
        case c if c == 'F' && s.startsWith("False", pos) => { pos += 5; sb.append("false") }
        case c if c == '-' || c == '+' || c.isDigit || c == '.' => parseNumber(sb)
        case _ => fail()
      }
    }

    def parseString(sb: StringBuilder): Unit = {
      val quote = peek
      pos += 1
      sb.append('"')
      while (true) {
        if (pos >= s.length) fail()
        val c = s.charAt(pos)
        if (c == quote) {
          pos += 1
          sb.append('"')
          return
        } else if (c == '\\') {
          if (pos + 1 >= s.length) fail()
          val e = s.charAt(pos + 1)
          e match {
            case 'n'  => sb.append("\\n")
            case 't'  => sb.append("\\t")
            case 'r'  => sb.append("\\r")
            case '\\' => sb.append("\\\\")
            case '\'' => sb.append('\'')
            case '"'  => sb.append("\\\"")
            case 'u'  =>
              if (pos + 5 >= s.length) fail()
              sb.append('\\').append('u').append(s.substring(pos + 2, pos + 6))
              pos += 4
            case 'x'  =>
              if (pos + 3 >= s.length) fail()
              val code = Integer.parseInt(s.substring(pos + 2, pos + 4), 16)
              sb.append(f"\\u$code%04x")
              pos += 2
            case _    => fail()
          }
          pos += 2
        } else {
          c match {
            case '"'  => sb.append("\\\"")
            case '\\' => sb.append("\\\\")
            case x if x < ' ' => sb.append(f"\\u${x.toInt}%04x")
            case x    => sb.append(x)
          }
          pos += 1
        }
      }
    }

    def parseNumber(sb: StringBuilder): Unit = {
      val start = pos
      if (peek == '-' || peek == '+') pos += 1
      var sawDigit = false
      while (pos < s.length && (s.charAt(pos).isDigit || s.charAt(pos) == '.' ||
             s.charAt(pos) == 'e' || s.charAt(pos) == 'E' ||
             ((s.charAt(pos) == '-' || s.charAt(pos) == '+') &&
              (s.charAt(pos - 1) == 'e' || s.charAt(pos - 1) == 'E')))) {
        if (s.charAt(pos).isDigit) sawDigit = true
        pos += 1
      }
      if (!sawDigit) fail()
      val tok = s.substring(start, pos)
      // Validate via JVM parse; emit verbatim (JSON accepts the same grammar
      // minus leading '+', which we strip).
      try { tok.toDouble } catch { case _: NumberFormatException => fail() }
      sb.append(if (tok.startsWith("+")) tok.substring(1) else tok)
    }

    def parseSeq(sb: StringBuilder, open: Char, close: Char): Unit = {
      expect(open)
      sb.append('[')
      skipWs()
      var first = true
      while (peek != close) {
        if (!first) { expect(','); skipWs(); sb.append(','); if (peek == close) { /* trailing comma */ } }
        if (peek != close) { parseValue(sb); skipWs(); first = false }
      }
      // remove dangling comma from a trailing-comma literal like [1,]
      if (sb.nonEmpty && sb.last == ',') sb.setLength(sb.length - 1)
      expect(close)
      sb.append(']')
    }

    def parseDict(sb: StringBuilder): Unit = {
      expect('{')
      sb.append('{')
      skipWs()
      var first = true
      while (peek != '}') {
        if (!first) { expect(','); skipWs(); sb.append(',') }
        if (peek != '}') {
          // JSON keys must be strings; python literal keys here always are.
          if (peek != '\'' && peek != '"') fail()
          parseString(sb)
          skipWs()
          expect(':')
          sb.append(':')
          parseValue(sb)
          skipWs()
          first = false
        }
      }
      if (sb.nonEmpty && sb.last == ',') sb.setLength(sb.length - 1)
      expect('}')
      sb.append('}')
    }
  }
}

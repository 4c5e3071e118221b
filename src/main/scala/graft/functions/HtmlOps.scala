package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Engine-side HTML scan + CSS select (reference S7: the selectolax
  * queries of `crawler/utils.py:146-150,217,336-339` and
  * `crawler/metadata.py:115-130`, e.g. `a.ai-track-btn`,
  * `div.poster a`, `div.pagination span`, `a[href*='tac-gia']`,
  * `i.fa-microphone ~ a`). The network fetch stays a declared
  * out-of-engine boundary; this operates on an HTML *column* — the
  * fixture-driven "source UDTF over a URL column" shape SURVEY §2.1
  * sketches.
  *
  * The parser is a single-pass regex-free tag scanner building a
  * lightweight DOM: lax closing (unmatched close tags pop to the
  * nearest open match), HTML void elements never push, script/style
  * bodies are skipped raw, comments/doctype/processing instructions
  * skipped. Element text is the concatenation of descendant text
  * runs in document order, outer-trimmed; entities are NOT decoded
  * (documented engine semantics — fixture-pinned, no selectolax
  * bit-parity claim).
  *
  * Selector support: `tag`, `.class`, `#id`, `[attr]`, `[attr=v]`,
  * `[attr*=v]` (quoted or bare values), compounds thereof, the
  * descendant combinator (whitespace), and the general sibling
  * combinator `~` — the full set the reference uses.
  */
object HtmlOps {

  private val VoidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  final case class Node(
      idx: Int, parent: Int, tag: String, attrs: Map[String, String]) {
    def classes: Array[String] =
      attrs.get("class").map(_.trim.split("\\s+")).getOrElse(Array.empty)
  }

  /** Parse result: nodes in document order plus the raw material for
    * LAZY text assembly. `end(i)` is the exclusive end of node i's
    * descendant index range (document-order creation makes every
    * subtree a contiguous index run), and each text run is a
    * (deepest-open-owner, start, end) span into the original html —
    * nothing is concatenated at parse time, so unmatched nodes on a
    * crawl-scale page cost zero string building. */
  final case class Doc(
      html: String, nodes: Array[Node], end: Array[Int],
      runOwner: Array[Int], runStart: Array[Int], runEnd: Array[Int],
      runLo: Array[Int], runHi: Array[Int]) {
    /** Concatenated descendant text runs of node i, document order
      * (untrimmed — callers trim the outer edges). Runs are appended
      * in parse order, so a subtree's runs are the contiguous range
      * recorded while its root was open — `[runLo(i), runHi(i))` —
      * and each text() call costs only its own output, never a scan
      * of the whole document's run list (a broad selector on a
      * run-heavy crawl page made the full scan quadratic). */
    def text(i: Int): String = {
      val sb = new java.lang.StringBuilder
      var r = runLo(i)
      val hi = runHi(i)
      while (r < hi) {
        sb.append(html, runStart(r), runEnd(r))
        r += 1
      }
      sb.toString
    }
  }

  /** One simple selector: tag / classes / id / attribute predicates
    * ANDed together. `attrOps` entries are (name, op, value) with op
    * one of "" (present), "=", "*=". */
  final case class Simple(
      tag: Option[String], classes: List[String], id: Option[String],
      attrOps: List[(String, String, String)]) {
    def matches(n: Node): Boolean =
      tag.forall(_ == n.tag) &&
      id.forall(v => n.attrs.get("id").contains(v)) &&
      classes.forall(c => n.classes.contains(c)) &&
      attrOps.forall {
        case (a, "", _)    => n.attrs.contains(a)
        case (a, "=", v)   => n.attrs.get(a).contains(v)
        case (a, "*=", v)  => n.attrs.get(a).exists(_.contains(v))
        case _             => false
      }
  }

  /** Parsed selector: simple selectors joined right-to-left by
    * combinators — `" "` (descendant) or `"~"` (general sibling). */
  final case class Selector(parts: List[(String, Simple)], last: Simple)

  def parseSelector(sel: String): Selector = {
    // tokenize on whitespace, keeping "~" as its own token
    val toks = sel.trim.replace("~", " ~ ").split("\\s+").filter(_.nonEmpty).toList
    require(toks.nonEmpty, s"empty selector: '$sel'")
    def simple(s: String): Simple = {
      var tag: Option[String] = None
      var id: Option[String] = None
      val classes = List.newBuilder[String]
      val attrs = List.newBuilder[(String, String, String)]
      var i = 0
      val n = s.length
      def scanName(): String = {
        val st = i
        while (i < n && s.charAt(i) != '.' && s.charAt(i) != '#' && s.charAt(i) != '[') i += 1
        s.substring(st, i)
      }
      if (i < n && s.charAt(i) != '.' && s.charAt(i) != '#' && s.charAt(i) != '[') {
        val t = scanName()
        if (t != "*") tag = Some(t.toLowerCase)
      }
      while (i < n) {
        s.charAt(i) match {
          case '.' => i += 1; classes += scanName()
          case '#' => i += 1; id = Some(scanName())
          case '[' =>
            val end = s.indexOf(']', i)
            require(end > i, s"unclosed [ in selector: '$sel'")
            val body = s.substring(i + 1, end)
            i = end + 1
            val (name, op, raw) =
              if (body.contains("*=")) {
                val Array(a, v) = body.split("\\*=", 2); (a, "*=", v)
              } else if (body.contains("=")) {
                val Array(a, v) = body.split("=", 2); (a, "=", v)
              } else (body, "", "")
            val v = raw.stripPrefix("'").stripSuffix("'")
              .stripPrefix("\"").stripSuffix("\"")
            attrs += ((name.trim.toLowerCase, op, v))
          case _ => i += 1 // tolerate stray chars
        }
      }
      Simple(tag, classes.result(), id, attrs.result())
    }
    // Each token records the combinator to its LEFT; the right-to-left
    // walk needs (combinator between k-1 and k, simple k-1) pairs, so
    // shift combinators one slot: parts(i) = (comb(i+1), simple(i)).
    var combinator = " "
    val built = ArrayBuffer.empty[(String, Simple)]
    toks.foreach {
      case "~" => combinator = "~"
      case t   => built += ((combinator, simple(t))); combinator = " "
    }
    val parts = (0 until built.length - 1)
      .map(i => (built(i + 1)._1, built(i)._2)).toList
    Selector(parts, built.last._2)
  }

  /** Case-insensitive indexOf via regionMatches — no per-call copy of
    * the haystack, and no Unicode case-mapping length drift shifting
    * the returned offset (both hazards of `haystack.toLowerCase`). */
  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val last = hay.length - needle.length
    var j = if (from < 0) 0 else from
    while (j <= last) {
      if (hay.regionMatches(true, j, needle, 0, needle.length)) return j
      j += 1
    }
    -1
  }

  /** Parse `html` into a [[Doc]]. Index 0 is a synthetic root so every
    * real node has a parent. */
  def parse(html: String): Doc = {
    val nodes = ArrayBuffer[Node](Node(0, -1, "", Map.empty))
    val end = ArrayBuffer[Int](Int.MaxValue)
    val open = ArrayBuffer[Int](0)
    val runOwner = ArrayBuffer.empty[Int]
    val runStart = ArrayBuffer.empty[Int]
    val runEnd = ArrayBuffer.empty[Int]
    // Contiguous run range per node: runLo at creation, runHi when
    // the node closes (pop or EOF) — every run recorded in between
    // belongs to its subtree. Leaves keep the empty range.
    val runLo = ArrayBuffer[Int](0)
    val runHi = ArrayBuffer[Int](0)
    val n = html.length
    var i = 0
    def recordText(st: Int, en: Int): Unit =
      if (en > st) { runOwner += open.last; runStart += st; runEnd += en }
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { recordText(i, n); i = n }
      else {
        recordText(i, lt)
        if (html.startsWith("<!--", lt)) {
          val e = html.indexOf("-->", lt); i = if (e < 0) n else e + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val e = html.indexOf('>', lt); i = if (e < 0) n else e + 1
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/') {
          val e = html.indexOf('>', lt)
          val tag = html.substring(lt + 2, if (e < 0) n else e).trim.toLowerCase
          val at = open.lastIndexWhere(oi => nodes(oi).tag == tag)
          if (at > 0) { // lax: pop to match; every popped subtree is complete
            var k = open.length - 1
            while (k >= at) {
              end(open(k)) = nodes.length
              runHi(open(k)) = runOwner.length
              k -= 1
            }
            open.remove(at, open.length - at)
          }
          i = if (e < 0) n else e + 1
        } else {
          val e = html.indexOf('>', lt)
          if (e < 0) { i = n }
          else {
            val inner = html.substring(lt + 1, e)
            val selfClose = inner.endsWith("/")
            val body = if (selfClose) inner.dropRight(1) else inner
            val (tag, attrs) = parseTag(body)
            if (tag.nonEmpty) {
              val idx = nodes.length
              nodes += Node(idx, open.last, tag, attrs)
              end += idx + 1 // leaf until proven open
              runLo += runOwner.length
              runHi += runOwner.length // leaves keep the empty range
              if (!selfClose && !VoidTags.contains(tag)) {
                if (tag == "script" || tag == "style") {
                  val close = indexOfIgnoreCase(html, s"</$tag", e)
                  val ce = if (close < 0) n else html.indexOf('>', close)
                  i = if (close < 0 || ce < 0) n else ce + 1
                } else open += idx
              }
            }
            if (i <= e) i = e + 1
          }
        }
      }
    }
    open.foreach { oi => // unclosed at EOF (root included)
      end(oi) = nodes.length
      runHi(oi) = runOwner.length
    }
    Doc(html, nodes.toArray, end.toArray,
      runOwner.toArray, runStart.toArray, runEnd.toArray,
      runLo.toArray, runHi.toArray)
  }

  private def parseTag(body: String): (String, Map[String, String]) = {
    val s = body.trim
    if (s.isEmpty) return ("", Map.empty)
    var i = 0
    val n = s.length
    while (i < n && !s.charAt(i).isWhitespace) i += 1
    val tag = s.substring(0, i).toLowerCase
    if (!tag.forall(c => c.isLetterOrDigit || c == '-' || c == ':')) return ("", Map.empty)
    val attrs = Map.newBuilder[String, String]
    while (i < n) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (i < n) {
        val st = i
        while (i < n && s.charAt(i) != '=' && !s.charAt(i).isWhitespace) i += 1
        val name = s.substring(st, i).toLowerCase
        var value = ""
        if (i < n && s.charAt(i) == '=') {
          i += 1
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i); i += 1
            val ve = s.indexOf(q, i)
            value = s.substring(i, if (ve < 0) n else ve)
            i = if (ve < 0) n else ve + 1
          } else {
            val vs = i
            while (i < n && !s.charAt(i).isWhitespace) i += 1
            value = s.substring(vs, i)
          }
        }
        if (name.nonEmpty) attrs += (name -> value)
      }
    }
    (tag, attrs.result())
  }

  /** All nodes matching `selector`, in document order. */
  def select(doc: Doc, selector: Selector): Array[Node] = {
    val nodes = doc.nodes
    def matchesUp(node: Node, parts: List[(String, Simple)]): Boolean = parts match {
      case Nil => true
      case (" ", simple) :: rest =>
        // some ancestor matches simple and the rest above it
        var p = node.parent
        while (p > 0) {
          if (simple.matches(nodes(p)) && matchesUp(nodes(p), rest)) return true
          p = nodes(p).parent
        }
        false
      case ("~", simple) :: rest =>
        // some PRECEDING sibling matches simple and the rest above it
        var j = node.idx - 1
        while (j > 0) {
          val c = nodes(j)
          if (c.parent == node.parent && c.idx < node.idx && simple.matches(c) &&
              matchesUp(c, rest)) return true
          j -= 1
        }
        false
      case _ => false
    }
    nodes.drop(1).filter(nd =>
      selector.last.matches(nd) && matchesUp(nd, selector.parts.reverse))
  }

  /** Parse + select + project: (pos, tag, text, attrs) per match.
    * Text is assembled ONLY for matched nodes — the parse records
    * spans, so a page with a handful of matches does no string
    * building for the rest of its DOM. */
  def cssSelect(html: String, selector: Selector): Array[(Int, String, String, Map[String, String])] = {
    val doc = parse(html)
    select(doc, selector).zipWithIndex.map { case (nd, i) =>
      (i, nd.tag, doc.text(nd.idx).trim, nd.attrs)
    }
  }
}

package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.PropSampling

/** Adversarial property fuzz for the two hand-written parsers.
  *
  * HtmlOps.parse is a lax crawl-scale scanner: it must NEVER throw,
  * and its structural invariants (root at 0, parents precede
  * children, subtree index ranges nest, text runs stay inside the
  * input) must hold for arbitrary byte soup — a crawler feeds it
  * whatever the internet serves. PyLiteral.toJson must round-trip
  * machine-generated Python literals exactly and degrade to null
  * (never an exception) under mutation, mirroring the reference's
  * `ast.literal_eval` + `except → None` tolerance.
  */
class ParserFuzzSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- HTML

  private val voidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  private sealed trait H
  private case class Elem(tag: String, attrs: Seq[(String, String)], kids: Seq[H]) extends H
  private case class Text(s: String) extends H

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', 'đ', 'ő')))
      .map(_.mkString)

  private val attrGen: Gen[(String, String)] = for {
    name <- Gen.oneOf("class", "id", "href", "data-x")
    v <- Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString)
  } yield (name, v)

  private def elemGen(depth: Int): Gen[H] =
    if (depth == 0) textGen.map(Text)
    else for {
      tag <- Gen.oneOf("div", "p", "span", "a", "ul", "li", "b", "br", "img")
      attrs <- Gen.listOf(attrGen).map(_.take(2))
      kids <- if (voidTags(tag)) Gen.const(Nil)
              else Gen.listOf(Gen.frequency(
                3 -> elemGen(depth - 1), 2 -> textGen.map(Text))).map(_.take(4))
    } yield Elem(tag, attrs, kids)

  private def render(h: H): String = h match {
    case Text(s) => s
    case Elem(tag, attrs, kids) =>
      val a = attrs.map { case (k, v) => s""" $k="$v"""" }.mkString
      if (voidTags(tag)) s"<$tag$a>"
      else s"<$tag$a>${kids.map(render).mkString}</$tag>"
  }

  private def countElems(h: H): Int = h match {
    case Text(_) => 0
    case Elem(_, _, kids) => 1 + kids.map(countElems).sum
  }

  private def allText(h: H): String = h match {
    case Text(s) => s
    case Elem(_, _, kids) => kids.map(allText).mkString
  }

  private def structuralLaws(html: String): Unit = {
    val doc = HtmlOps.parse(html) // law 0: never throws
    val n = doc.nodes.length
    assert(doc.nodes(0).tag == "" && doc.nodes(0).parent == -1)
    for (i <- 1 until n) {
      val nd = doc.nodes(i)
      assert(nd.idx == i)
      assert(0 <= nd.parent && nd.parent < i, s"parent precedes child at $i")
      assert(i < doc.end(i) && doc.end(i) <= n, s"subtree range of $i")
      if (nd.parent > 0)
        assert(doc.end(i) <= doc.end(nd.parent), s"range of $i nests in parent")
      if (voidTags(nd.tag) || nd.tag == "script" || nd.tag == "style")
        assert(doc.end(i) == i + 1, s"${nd.tag} at $i must be a leaf")
    }
    for (r <- doc.runOwner.indices) {
      assert(0 <= doc.runStart(r) && doc.runStart(r) <= doc.runEnd(r)
        && doc.runEnd(r) <= html.length, s"text run $r inside input")
      assert(doc.runOwner(r) >= 0 && doc.runOwner(r) < n, s"run owner $r valid")
    }
    doc.text(0) // lazy text assembly never throws either
    HtmlOps.select(doc, HtmlOps.parseSelector("div p")) // nor matching
    ()
  }

  test("html parse: structural laws + exact element count and text on well-formed trees") {
    for (tree <- PropSampling.sample(elemGen(3), n = 100)) {
      val html = render(tree)
      structuralLaws(html)
      val doc = HtmlOps.parse(html)
      assert(doc.nodes.length - 1 == countElems(tree),
        s"element count on ${html.take(120)}")
      assert(doc.text(0) == allText(tree), s"root text on ${html.take(120)}")
    }
  }

  private val mutationGen: Gen[(String, Int, Char)] = for {
    tree <- elemGen(3)
    html = render(tree)
    pos <- Gen.chooseNum(0, math.max(0, html.length - 1))
    c <- Gen.oneOf('<', '>', '/', '=', '\'', '"', '&', '!', ' ')
  } yield (html, pos, c)

  test("html parse: lax laws survive random mutation (delete / insert / truncate / stray tags)") {
    for ((html, pos, c) <- PropSampling.sample(mutationGen, n = 100)) {
      if (html.nonEmpty) {
        structuralLaws(html.substring(0, pos) + html.substring(math.min(pos + 1, html.length)))
        structuralLaws(html.substring(0, pos) + c + html.substring(pos))
        structuralLaws(html.take(pos))
      }
      structuralLaws("</div>" + html + "<p><b></p></b>" + html)
      structuralLaws("<script>" + html) // unterminated raw-text element
    }
  }

  test("html parse: pure byte soup never throws") {
    val soup = Gen.listOf(Gen.oneOf(
      Gen.oneOf('<', '>', '/', '=', '\'', '"', '&', '!', '-', ' '),
      Gen.alphaNumChar)).map(_.mkString)
    PropSampling.sample(soup, n = 200).foreach(structuralLaws)
  }

  // ----------------------------------------------------------- PyLiteral

  private sealed trait Py
  private case class PStr(s: String) extends Py
  private case class PNum(repr: String) extends Py
  private case class PBool(b: Boolean) extends Py
  private case object PNone extends Py
  private case class PSeq(items: Seq[Py], tuple: Boolean) extends Py
  private case class PDict(pairs: Seq[(String, Py)]) extends Py

  private val pyStrChars: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '.', 'đ', ','),
    1 -> Gen.oneOf('"', '\'', '\\', '\n', '\t'))

  private def pyGen(depth: Int): Gen[Py] = {
    val leaf = Gen.frequency(
      3 -> Gen.listOf(pyStrChars).map(cs => PStr(cs.mkString)),
      2 -> Gen.oneOf(
        Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2).map(v => PNum(v.toString)),
        Gen.oneOf("0.5", "-2.25", "3.125", "1e3", "-0.125").map(PNum)),
      1 -> Gen.oneOf(PBool(true), PBool(false), PNone))
    if (depth == 0) leaf
    else Gen.frequency(
      2 -> leaf,
      1 -> Gen.listOf(pyGen(depth - 1)).map(xs => PSeq(xs.take(4), tuple = false)),
      1 -> Gen.listOf(pyGen(depth - 1)).map(xs => PSeq(xs.take(4), tuple = true)),
      1 -> Gen.listOf(Gen.zip(Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString),
          pyGen(depth - 1))).map(ps => PDict(ps.take(3))))
  }

  /** Python repr with randomized quote choice, spacing, and trailing
    * commas — the shapes `repr()` and hand-written CSVs produce. */
  private def renderPy(p: Py, quote: Char, spaced: Boolean, trail: Boolean): String = {
    val sp = if (spaced) " " else ""
    def str(s: String): String = {
      val b = new StringBuilder; b += quote
      s.foreach {
        case c if c == quote => b += '\\' += c
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\t' => b.append("\\t")
        case c => b += c
      }
      (b += quote).toString
    }
    p match {
      case PStr(s) => str(s)
      case PNum(r) => r
      case PBool(b) => if (b) "True" else "False"
      case PNone => "None"
      case PSeq(items, tuple) =>
        val (o, c) = if (tuple) ("(", ")") else ("[", "]")
        val t = if (trail && items.nonEmpty) "," else ""
        items.map(renderPy(_, quote, spaced, trail)).mkString(o, "," + sp, t + c)
      case PDict(pairs) =>
        pairs.map { case (k, v) => str(k) + ":" + sp + renderPy(v, quote, spaced, trail) }
          .mkString("{", "," + sp, "}")
    }
  }

  /** Canonical JSON the parse must produce (verbatim number repr,
    * minus a leading '+' which PyLiteral strips). */
  private def expectedJson(p: Py): String = p match {
    case PStr(s) =>
      val b = new StringBuilder("\"")
      s.foreach {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\t' => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b += c
      }
      (b += '"').toString
    case PNum(r) => r
    case PBool(b) => if (b) "true" else "false"
    case PNone => "null"
    case PSeq(items, _) => items.map(expectedJson).mkString("[", ",", "]")
    case PDict(pairs) =>
      pairs.map { case (k, v) => expectedJson(PStr(k)) + ":" + expectedJson(v) }
        .mkString("{", ",", "}")
  }

  private val pyCase: Gen[(Py, Char, Boolean, Boolean)] = for {
    p <- pyGen(3)
    q <- Gen.oneOf('\'', '"')
    sp <- Gen.oneOf(true, false)
    tr <- Gen.oneOf(true, false)
  } yield (p, q, sp, tr)

  test("pyliteral: random literals round-trip to canonical JSON under any rendering style") {
    for ((p, q, sp, tr) <- PropSampling.sample(pyCase, n = 100)) {
      val rendered = renderPy(p, q, sp, tr)
      assert(PyLiteral.toJson(rendered) == expectedJson(p),
        s"round-trip of $rendered")
    }
  }

  test("pyliteral: mutated literals never throw — they parse or return null") {
    val mutated = for {
      (p, q, sp, tr) <- pyCase
      s = renderPy(p, q, sp, tr)
      pos <- Gen.chooseNum(0, math.max(0, s.length - 1))
      c <- Gen.oneOf('[', ']', '{', '}', '(', ')', '\'', '"', ',', ':', '\\', 'x')
    } yield Seq(
      if (s.isEmpty) "" else s.substring(0, pos) + s.substring(math.min(pos + 1, s.length)),
      s.substring(0, math.min(pos, s.length)) + c + s.substring(math.min(pos, s.length)),
      s.take(pos))
    for (cases <- PropSampling.sample(mutated, n = 100); m <- cases) {
      val r = PyLiteral.toJson(m) // must not throw; null or a JSON string
      if (r != null) assert(r.isEmpty || !r.exists(_ < ' '), s"control chars leaked from $m")
    }
  }
}

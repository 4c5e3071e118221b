package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the S7 CSS-select surface on a fixture shaped like the pages
  * the reference scrapes (`crawler/utils.py:146-150,217,336-339`,
  * `crawler/metadata.py:115-130`): the `a.ai-track-btn` track list,
  * `div.poster a` catalog links, `div.pagination span` page label,
  * `a[href*='tac-gia']` author link, `i.fa-microphone ~ a` narrator
  * siblings, and bare-`tr` table rows. */
class HtmlSpec extends SparkSuite {

  private val fixture = """<!DOCTYPE html>
    <html><head><title>Sách nói</title>
      <script>var x = "<tr>not real</tr>";</script>
      <style>.poster a { color: red; }</style>
    </head>
    <body>
      <!-- catalog grid -->
      <div class="poster">
        <a href="/sach/truyen-kieu">Truyện Kiều</a>
        <a href="/sach/lao-hac">Lão Hạc</a>
      </div>
      <div class="pagination"><span>Trang 1 / 25</span></div>
      <div class="data"><h1>Truyện Kiều</h1></div>
      <div class="entry-content">
        <a href="/the-loai/van-hoc">Văn học</a>
        <a href="/tac-gia/nguyen-du">Nguyễn Du</a>
      </div>
      <p><i class="fa fa-microphone"></i> <a href="/giong-doc/a">Giọng A</a>
         <a href="/giong-doc/b">Giọng B</a></p>
      <div class="playlist">
        <a class="ai-track-btn" href="https://cdn.example.com/t/001.mp3">Tập 1</a>
        <a class="ai-track-btn other" href="https://cdn.example.com/t/002.mp3">Tập 2</a>
        <a class="track" href="https://cdn.example.com/t/ignore.mp3">Khác</a>
      </div>
      <table>
        <tr><td>PDF</td><td><a href="/files/book.pdf">tải về</a></td></tr>
        <tr><td>EPUB</td><td><a href="/files/book.epub">tải về</a></td></tr>
      </table>
      <img src="/x.png"><br>
      <div class="featu">12:34:56</div>
    </body></html>"""

  private def hits(selector: String): Seq[(String, String, Option[String])] = {
    import spark.implicits._
    Seq(fixture).toDF("html")
      .select(GraftFunctions.css_select(col("html"), selector))
      .select(col("tag"), col("text"), element_at(col("attrs"), "href").as("href"))
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
  }

  test("a.ai-track-btn extracts exactly the track hrefs, in order") {
    assert(hits("a.ai-track-btn").map(_._3.get) ===
      Seq("https://cdn.example.com/t/001.mp3", "https://cdn.example.com/t/002.mp3"))
  }

  test("div.poster a descendant selector finds catalog links only") {
    assert(hits("div.poster a").map(t => (t._2, t._3.get)) ===
      Seq(("Truyện Kiều", "/sach/truyen-kieu"), ("Lão Hạc", "/sach/lao-hac")))
  }

  test("div.pagination span yields the page label") {
    assert(hits("div.pagination span").map(_._2) === Seq("Trang 1 / 25"))
  }

  test("attribute-contains matches the author link") {
    assert(hits("a[href*='tac-gia']").map(_._2) === Seq("Nguyễn Du"))
  }

  test("general sibling combinator: i.fa-microphone ~ a") {
    assert(hits("i.fa-microphone ~ a").map(_._2) === Seq("Giọng A", "Giọng B"))
  }

  test("bare tag selector sees real rows, not script text") {
    val trs = hits("tr")
    assert(trs.length === 2)
    assert(trs.head._2.startsWith("PDF"))
  }

  test("class-only and id-free compound: .featu") {
    assert(hits(".featu").map(_._2) === Seq("12:34:56"))
  }

  test("descendant text concatenates nested runs; attrs map is complete") {
    import spark.implicits._
    val r = Seq("""<div id="d" data-k="v"><b>one</b> two</div>""").toDF("html")
      .select(GraftFunctions.css_select(col("html"), "div"))
      .select(col("text"), col("attrs")).head()
    assert(r.getString(0) === "one two")
    assert(r.getMap[String, String](1) === Map("id" -> "d", "data-k" -> "v"))
  }

  test("null html yields no rows; unmatched selector yields no rows") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("<p>x</p>")).toDF("html")
    assert(df.select(GraftFunctions.css_select(col("html"), "video")).count() === 0)
  }

  test("lax parsing: unclosed tags, uppercase tags, bare attribute values") {
    import spark.implicits._
    val messy = """<DIV CLASS=poster><P>first<P>second
      <a HREF=/x/1>one</a><a href='/x/2'>two</DIV>"""
    val rows = Seq(messy).toDF("html")
      .select(GraftFunctions.css_select(col("html"), "div.poster a"))
      .select(col("text"), element_at(col("attrs"), "href").as("href"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // <p> never closed (lax), tag/attr names case-folded, bare and
    // single-quoted attr values both parsed; the unclosed second <a>
    // is closed by the enclosing </div> pop.
    assert(rows.toSeq === Seq(("one", "/x/1"), ("two", "/x/2")))
  }

  test("nested same-tag elements match independently with correct text scope") {
    import spark.implicits._
    val html = """<div id="outer">a<div id="inner">b</div>c</div>"""
    val rows = Seq(html).toDF("html")
      .select(GraftFunctions.css_select(col("html"), "div"))
      .select(element_at(col("attrs"), "id").as("id"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("outer", "abc"), ("inner", "b")))
  }

  test("SQL registration: css_select usable from spark.sql") {
    import spark.implicits._
    Seq(fixture).toDF("html").createOrReplaceTempView("pages")
    val n = spark.sql(
      "SELECT pos, attrs['href'] AS href FROM pages " +
      "LATERAL VIEW css_select(html, 'a.ai-track-btn') t AS pos, tag, text, attrs")
      .count()
    assert(n === 2)
  }
}

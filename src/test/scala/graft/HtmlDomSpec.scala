package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HtmlDom
import graft.ops.HtmlDom.Block

/** Tag-soup pathology pins for the DOM block-tree parser — the cases
  * the regex splitters structurally cannot get right (quoted '>',
  * raw-text elements, implied closes, mis-nesting). The well-formed
  * template is hash-proven end-to-end by d_dom_blocks/d_dom_extract. */
class HtmlDomSpec extends AnyFunSuite {

  private def texts(html: String): List[String] =
    HtmlDom.blocks(html).map(_.text).toList
  private def paths(html: String): List[String] =
    HtmlDom.blocks(html).map(_.path).toList

  test("quoted '>' inside an attribute does not end the tag") {
    val bs = HtmlDom.blocks("""<div title="a > b">inside</div>after""")
    assert(bs.map(b => (b.path, b.text)) ==
      IndexedSeq(("div", "inside"), ("", "after")))
  }

  test("raw-text elements: close tags inside script strings are data") {
    val html = """<div>before<script>var s = "</div><p>fake";</script>after</div>"""
    assert(texts(html) == List("beforeafter"))
    // case-insensitive close, style too
    assert(texts("<p>x</p><STYLE>p { content: '</p>' }</StYlE><p>y</p>")
      == List("x", "y"))
    // textarea/title content dropped
    assert(texts("<p>a</p><textarea><p>not a block</p></textarea><title>t</title><p>b</p>")
      == List("a", "b"))
  }

  test("comments and doctype tokenize as units even when they contain tags") {
    assert(texts("<!DOCTYPE html><p>a<!-- <div>hidden</div> -->b</p>")
      == List("ab"))
    // unterminated comment swallows the tail (never throws)
    assert(texts("<p>kept</p><!-- open") == List("kept"))
  }

  test("CDATA is literal text with NO entity decode") {
    assert(texts("<p>x <![CDATA[a &amp; <b>]]> y</p>")
      == List("x a &amp; <b> y"))
  }

  test("implied closes: p chains, li lists, table cells") {
    assert(paths("<p>one<p>two") == List("p", "p"))
    assert(texts("<p>one<p>two") == List("one", "two"))
    assert(paths("<ul><li>a<li>b</ul>") == List("ul>li", "ul>li"))
    assert(paths("<table><tr><td>a<td>b<tr><td>c</table>") ==
      List("table>tr>td", "table>tr>td", "table>tr>td"))
    // a block start closes an open <p>, so the div is a SIBLING
    assert(paths("<p>par<div>block</div>") == List("p", "div"))
  }

  test("mis-nesting: a close tag pops abandoned children; strays ignored") {
    // </div> implicitly closes the still-open <p>
    assert(paths("<div><p>x</div>y") == List("div>p", ""))
    // a stray close with no open match changes nothing
    assert(paths("<p>a</table></section>b</p>") == List("p"))
    assert(texts("<p>a</table></section>b</p>") == List("ab"))
    // inline closes never touch structure
    assert(paths("<p>a</b></span>b</p>") == List("p"))
  }

  test("entities decode once, &amp; last; inline tags join words") {
    assert(texts("<p>a &amp;lt; b</p>") == List("a &lt; b"))
    assert(texts("<p>x&nbsp;&nbsp;y &quot;q&#39;s&quot; 1 &lt; 2</p>")
      == List("x y \"q's\" 1 < 2"))
    // browser word-joining: no space injected at inline boundaries
    assert(texts("<p>un<b>bold</b>ed</p>") == List("unbolded"))
  }

  test("br/hr flush new blocks at the same path; inline voids are inert") {
    val bs = HtmlDom.blocks("<p>line one<br>line two<hr><img src=\"x.png\">tail</p>")
    assert(bs.map(b => (b.pos, b.path, b.text)) == IndexedSeq(
      (1, "p", "line one"), (2, "p", "line two"), (3, "p", "tail")))
    // img (inline void) joins flow: no break, no text
    assert(texts("<p>a<img src=\"x\">b</p>") == List("ab"))
  }

  test("anchor text tallies per <a>; chrome ancestry flags nav/footer") {
    val bs = HtmlDom.blocks(
      "<nav><a href=\"/\">home</a> <a href=\"/x\">ab out</a></nav><p>body</p>")
    assert(bs.head == Block(1, 1, "nav", "home ab out", 10, chrome = true))
    assert(bs(1) == Block(2, 1, "p", "body", 0, chrome = false))
    // anchor spanning a block boundary: each block tallies its own part
    val spanned = HtmlDom.blocks("<div><a>left<p>right</a></p></div>")
    assert(spanned.map(b => (b.text, b.linkChars)) ==
      IndexedSeq(("left", 4), ("right", 5)))
  }

  test("tag soup edges: case, self-close, bare text, stray '<', unclosed EOF") {
    assert(paths("<DIV><P>x</P></DIV>") == List("div>p"))
    assert(paths("<div/>free") == List("")) // self-closed block: no push
    assert(HtmlDom.blocks("just text") ==
      IndexedSeq(Block(1, 0, "", "just text", 0, chrome = false)))
    assert(texts("<p>2 < 3 and 4 > 3</p>") == List("2 < 3 and 4 > 3"))
    assert(texts("<div><p>unclosed at eof") == List("unclosed at eof"))
    assert(texts("") == Nil)
  }

  test("depth and path reflect the real tree") {
    val bs = HtmlDom.blocks(
      "<html><body><article><div><ul><li>deep</li></ul></div></article></body></html>")
    assert(bs == IndexedSeq(
      Block(1, 6, "html>body>article>div>ul>li", "deep", 0, chrome = false)))
  }

  // ---- markdown serialization (tables + nested lists) ----

  test("markdown: pipe table with th header separator, row boundaries from events") {
    val md = HtmlDom.markdown(
      "<table><tr><th>name</th><th>value</th></tr>" +
        "<tr><td>alpha</td><td>one</td></tr>" +
        "<tr><td>beta</td><td>two</td></tr></table>")
    assert(md ==
      "| name | value |\n| --- | --- |\n| alpha | one |\n| beta | two |")
    // implied closes: <tr>/<td> without explicit closers — the soup
    // every real page writes; rows still split correctly
    val soup = HtmlDom.markdown(
      "<table><tr><td>a<td>b<tr><td>c<td>d</table>")
    assert(soup == "| a | b |\n| c | d |")
    // no th first row => no separator (don't invent a header)
    val noHeader = HtmlDom.markdown(
      "<table><tr><td>a</td></tr><tr><td>b</td></tr></table>")
    assert(noHeader == "| a |\n| b |")
  }

  test("markdown: table cells escape pipes, join multi-runs, keep empty columns") {
    val md = HtmlDom.markdown(
      "<table><tr><td>a|b</td><td>x<br>y</td><td></td><td>z</td></tr></table>")
    assert(md == "| a\\|b | x y |  | z |")
    // unclosed table at EOF still commits the accumulated row
    assert(HtmlDom.markdown("<table><tr><td>tail") == "| tail |")
  }

  test("markdown: nested lists indent; ol numbers per level; li continuation") {
    val md = HtmlDom.markdown(
      "<ul><li>outer one<ul><li>inner a</li><li>inner b</li></ul></li>" +
        "<li>outer two</li></ul>" +
        "<ol><li>first</li><li>second<ol><li>sub</li></ol></li></ol>")
    assert(md == List(
      "- outer one",
      "  - inner a",
      "  - inner b",
      "- outer two",
      "1. first",
      "2. second",
      "  1. sub").mkString("\n"))
  }

  test("markdown: headings, blockquote runs, chrome subtrees dropped") {
    val md = HtmlDom.markdown(
      "<nav><a href='/'>menu</a><table><tr><td>navcell</td></tr></table></nav>" +
        "<h2>title</h2><p>para</p>" +
        "<blockquote>outer<blockquote>inner</blockquote></blockquote>" +
        "<footer>fine print</footer>")
    assert(md == "## title\npara\n> outer\n> > inner")
  }
}

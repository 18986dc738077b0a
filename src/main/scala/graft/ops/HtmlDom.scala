package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Nesting-aware HTML block-tree extraction — the DOM-fidelity
  * complement of the regex chains in [[Text.extractHtmlText]] and
  * [[Boilerplate.densityExtract]] (reference role:
  * setu/text_extraction.py:556 trafilatura.extract). The flat splitters
  * are oracle-exact on well-formed markup but share regex extraction's
  * blind spots on real crawl HTML; this parser closes them:
  *
  *  - a `>` inside a QUOTED ATTRIBUTE (`<div title="a > b">`) does not
  *    end the tag;
  *  - `<script>`/`<style>`/`<textarea>`/`<title>` are RAW-TEXT
  *    elements: a `</div>` inside a script string is data, not a block
  *    boundary (the classic regex-splitter corruption);
  *  - comments / CDATA / doctype / processing instructions tokenize as
  *    units even when they contain tags;
  *  - HTML5 IMPLIED CLOSES: a block start closes an open `<p>`, `<li>`
  *    closes `<li>`, `<td>/<th>/<tr>` close their row/cell, so the
  *    tag-soup most pages actually ship still yields the right tree;
  *  - mis-nested close tags pop to their match (implicitly closing
  *    abandoned children) and stray closes are ignored;
  *  - every emitted block carries its ANCESTRY (path, depth, and a
  *    chrome flag for nav/footer/aside/header ancestors), which flat
  *    splitting cannot produce at all — and which is what lets an
  *    extractor drop navigation by STRUCTURE instead of by density
  *    heuristics alone.
  *
  * Text semantics: entities decode at append time (the same six the
  * regex chain handles, `&amp;` last so it cannot re-form), inline tags
  * join words like a browser (no injected space), whitespace collapses
  * at block emission, `<br>` flushes a new block at the same path.
  * Anchor text is tallied per `<a>` element (cleaned length summed at
  * each anchor close) for link-density scoring.
  *
  * Scale shape: the parser is a single forward scan per document — a
  * per-row expression ([[graft.functions.DomBlocks]]) with no joins, no
  * window, no state; everything downstream of it is ordinary relational
  * plan.
  */
object HtmlDom {

  /** One content block. `pos` is 1-based document order; `depth` the
    * number of open block ancestors; `path` their tag names joined by
    * '>'; `chrome` whether any ancestor is nav/footer/aside/header. */
  final case class Block(pos: Int, depth: Int, path: String, text: String,
      linkChars: Int, chrome: Boolean)

  private val BlockTags = Set(
    "html", "body", "head", "p", "div", "section", "article",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th",
    "blockquote", "pre", "header", "footer", "nav", "aside", "main",
    "figure", "figcaption", "form", "fieldset", "dl", "dt", "dd",
    "address", "center", "details", "summary")
  private val RawTextTags = Set("script", "style", "textarea", "title")
  private val VoidTags = Set("br", "hr", "img", "input", "meta", "link",
    "area", "base", "col", "embed", "source", "track", "wbr")
  private val ChromeTags = Set("nav", "footer", "aside", "header")

  /** The six entities of the shared regex chain, `&amp;` decoded LAST
    * so `&amp;lt;` yields the literal text `&lt;`. */
  private[ops] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
  }

  /** Collapse whitespace runs and trim — block emission cleanup. The
    * whitespace class is EXACTLY Java/DuckDB regex `\\s` (the repo's
    * cross-engine convention; `Character.isWhitespace` is broader —
    * unicode line/file separators — and would silently diverge from
    * the `regexp_replace(x, '\\s+', ' ')` oracles). */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private[ops] def clean(s: CharSequence): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) pendingSpace = sb.length() > 0
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** HTML5 auto-close: does an incoming block tag implicitly close the
    * innermost open element `top`? */
  private def impliedClose(top: String, incoming: String): Boolean =
    top match {
      case "p" => true // any block start closes an open paragraph
      case "li" => incoming == "li"
      case "td" | "th" =>
        incoming == "td" || incoming == "th" || incoming == "tr"
      case "tr" => incoming == "tr"
      case "dt" | "dd" => incoming == "dt" || incoming == "dd"
      case _ => false
    }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      if (hay.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Parse `html` into its content blocks, document order. Total: every
    * text character lands in exactly one block (or is dropped with its
    * raw-text/comment container); never throws on tag soup. */
  def blocks(html: String): IndexedSeq[Block] = {
    val out = ArrayBuffer.empty[Block]
    var pos = 0
    scan(html)(
      onFlush = (t, stack, linkChars) => {
        pos += 1
        out += Block(pos, stack.size, stack.mkString(">"), t, linkChars,
          stack.exists(ChromeTags))
      },
      onOpen = (_, _) => (),
      onClose = _ => ())
    out.toIndexedSeq
  }

  /** The single forward scan behind [[blocks]] and [[markdown]]: one
    * pass over the tag soup, reporting cleaned text runs (with the
    * block-ancestry stack and anchor-char tally) plus every structural
    * open/close — INCLUDING implied closes and mis-nesting pops, which
    * is what lets a serializer track table rows and list nesting
    * without re-parsing. */
  private def scan(html: String)(
      onFlush: (String, scala.collection.Seq[String], Int) => Unit,
      onOpen: (String, scala.collection.Seq[String]) => Unit,
      onClose: String => Unit): Unit = {
    val n = html.length
    val stack = ArrayBuffer.empty[String]
    val text = new java.lang.StringBuilder
    val anchorBuf = new java.lang.StringBuilder
    var linkChars = 0
    var anchorDepth = 0

    def appendText(raw: String, decode: Boolean): Unit = {
      if (raw.isEmpty) return
      val t = if (decode) decodeEntities(raw) else raw
      text.append(t)
      if (anchorDepth > 0) anchorBuf.append(t)
      ()
    }

    def closeAnchorRun(): Unit = {
      if (anchorBuf.length() > 0) {
        linkChars += clean(anchorBuf).length
        anchorBuf.setLength(0)
      }
    }

    def flush(): Unit = {
      // an anchor spanning a block boundary contributes what it has so
      // far to THIS block's link tally and keeps accumulating
      if (anchorDepth > 0) closeAnchorRun()
      val t = clean(text)
      if (t.nonEmpty) onFlush(t, stack, linkChars)
      text.setLength(0)
      linkChars = 0
    }

    def pop(): Unit = {
      onClose(stack.last)
      stack.remove(stack.size - 1)
      ()
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<' || i + 1 >= n) {
        val e = html.indexOf('<', i + 1)
        val end = if (e < 0) n else e
        appendText(html.substring(i, end), decode = true)
        i = end
      } else if (html.startsWith("<!--", i)) {
        val e = html.indexOf("-->", i + 4)
        i = if (e < 0) n else e + 3
      } else if (html.regionMatches(true, i, "<![CDATA[", 0, 9)) {
        val e = html.indexOf("]]>", i + 9)
        appendText(html.substring(i + 9, if (e < 0) n else e), decode = false)
        i = if (e < 0) n else e + 3
      } else if (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?') {
        val e = html.indexOf('>', i) // doctype / processing instruction
        i = if (e < 0) n else e + 1
      } else if (html.charAt(i + 1) == '/') {
        var j = i + 2
        val ns = j
        while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
        val name = html.substring(ns, j).toLowerCase
        val e = html.indexOf('>', j)
        i = if (e < 0) n else e + 1
        if (name == "a") {
          if (anchorDepth > 0) {
            anchorDepth -= 1
            if (anchorDepth == 0) closeAnchorRun()
          }
        } else if (BlockTags(name)) {
          if (stack.contains(name)) {
            flush()
            // pop abandoned children (mis-nesting), then the match
            while (stack.nonEmpty && stack.last != name) pop()
            if (stack.nonEmpty) pop()
          } // stray close with no open match: ignore
        } // inline closes (b/i/span/…): no structural effect
      } else if (Character.isLetter(html.charAt(i + 1))) {
        var j = i + 1
        val ns = j
        while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
        val name = html.substring(ns, j).toLowerCase
        // scan to the tag's real end: a '>' inside a quoted attribute
        // value does not count
        var q: Char = 0
        while (j < n && (q != 0 || html.charAt(j) != '>')) {
          val ch = html.charAt(j)
          if (q != 0) { if (ch == q) q = 0 }
          else if (ch == '"' || ch == '\'') q = ch
          j += 1
        }
        val selfClose = j > 0 && j < n && html.charAt(j - 1) == '/'
        val tagEnd = if (j < n) j + 1 else n
        if (RawTextTags(name)) {
          // raw-text element: content (script bodies, style sheets) is
          // data until the matching close tag — never block boundaries
          val p = indexOfIgnoreCase(html, "</" + name, tagEnd)
          i = if (p < 0) n
          else { val e = html.indexOf('>', p); if (e < 0) n else e + 1 }
        } else {
          i = tagEnd
          if (name == "a") {
            if (!selfClose) anchorDepth += 1
          } else if (name == "br" || name == "hr") {
            flush() // flow break (br line, hr rule): new block, same path
          } else if (VoidTags(name)) {
            () // no content, no structure
          } else if (BlockTags(name) && !selfClose) {
            flush()
            while (stack.nonEmpty && impliedClose(stack.last, name)) pop()
            stack += name
            onOpen(name, stack)
          }
          // inline opens (b/i/span/…) join words like a browser: no-op
        }
      } else {
        appendText("<", decode = false) // stray '<' is text
        i += 1
      }
    }
    flush()
  }

  /** Serialize `html` to markdown — the structure-preserving rendering
    * training corpora prefer over stripped text: h1..h6 → '#'-runs,
    * blockquote ancestry → '> '-runs, ul/ol items → indented
    * '- '/'N. ' markers with real nesting (ol items numbered per
    * level), tables → pipe rows with a '---' separator after a
    * th-header row, chrome subtrees (nav/footer/aside/header) dropped
    * entirely. Rides the same single forward [[scan]] as [[blocks]];
    * the open/close events (including implied closes) are what give
    * row boundaries — consecutive `td` blocks alone cannot say where
    * one `tr` ends and the next begins, which is exactly what flat
    * block post-processing gets wrong.
    *
    * Cell text escapes '|' as '\|'; multiple text runs inside one cell
    * join with a space; empty cells keep their column. A table whose
    * first row has no `th` gets no separator row (serialized data, not
    * a styled header the source never declared). */
  def markdown(html: String): String = {
    val lines = ArrayBuffer.empty[String]

    final class TableCtx(val suppressed: Boolean) {
      val row = ArrayBuffer.empty[String]
      var rowOpen = false
      var rowHasTh = false
      var rowsEmitted = 0
      val cell = new java.lang.StringBuilder
      var cellOpen = false
    }
    final class ListCtx(val ordered: Boolean) { var items = 0 }
    val tables = ArrayBuffer.empty[TableCtx]
    val lists = ArrayBuffer.empty[ListCtx]

    def commitCell(t: TableCtx): Unit = if (t.cellOpen) {
      t.row += t.cell.toString.trim
      t.cell.setLength(0)
      t.cellOpen = false
    }
    def commitRow(t: TableCtx): Unit = if (t.rowOpen) {
      commitCell(t)
      if (t.row.nonEmpty && !t.suppressed) {
        lines += t.row.mkString("| ", " | ", " |")
        t.rowsEmitted += 1
        if (t.rowsEmitted == 1 && t.rowHasTh)
          lines += Seq.fill(t.row.size)("---").mkString("| ", " | ", " |")
      }
      t.row.clear()
      t.rowOpen = false
      t.rowHasTh = false
    }

    val Heading = "^h([1-6])$".r
    scan(html)(
      onFlush = (t, stack, _) => {
        if (!stack.exists(ChromeTags)) {
          if (tables.nonEmpty &&
              stack.exists(s => s == "td" || s == "th")) {
            val tc = tables.last
            if (tc.cell.length() > 0) tc.cell.append(' ')
            tc.cell.append(t.replace("|", "\\|"))
            tc.cellOpen = true
          } else {
            val tag = stack.lastOption.getOrElse("")
            val listLevel = lists.size
            val prefix = tag match {
              case Heading(l) => "#" * l.toInt + " "
              case "li" if listLevel > 0 =>
                val marker =
                  if (lists.last.ordered) s"${lists.last.items}. " else "- "
                "  " * (listLevel - 1) + marker
              case _ if listLevel > 0 => "  " * listLevel // li continuation
              case _ => ""
            }
            val quote = "> " * stack.count(_ == "blockquote")
            lines += quote + prefix + t
          }
        }
      },
      onOpen = (name, stack) => name match {
        case "table" =>
          tables += new TableCtx(stack.exists(ChromeTags))
        case "tr" if tables.nonEmpty =>
          commitRow(tables.last)
          tables.last.rowOpen = true
        case "td" | "th" if tables.nonEmpty =>
          val tc = tables.last
          commitCell(tc)
          tc.rowOpen = true // a stray cell without <tr> still forms a row
          tc.cellOpen = true
          if (name == "th") tc.rowHasTh = true
        case "ul" => lists += new ListCtx(ordered = false)
        case "ol" => lists += new ListCtx(ordered = true)
        case "li" => if (lists.nonEmpty) lists.last.items += 1
        case _ => ()
      },
      onClose = {
        case "table" if tables.nonEmpty =>
          commitRow(tables.last)
          tables.remove(tables.size - 1)
          ()
        case "tr" if tables.nonEmpty => commitRow(tables.last)
        case "td" | "th" if tables.nonEmpty => commitCell(tables.last)
        case ("ul" | "ol") if lists.nonEmpty =>
          lists.remove(lists.size - 1)
          ()
        case _ => ()
      })
    // EOF with unclosed table elements: commit what accumulated
    while (tables.nonEmpty) {
      commitRow(tables.last)
      tables.remove(tables.size - 1)
    }
    lines.mkString("\n")
  }
}

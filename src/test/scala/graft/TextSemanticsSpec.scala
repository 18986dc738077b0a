package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.Text

/** Reference-semantics pins (SURVEY §1.3 + FIXTURES §10). */
class TextSemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[T]("r")

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): List[String] =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getSeq[String](0).toList

  test("word count: empty string counts 1 (Python ''.split(' ') parity)") {
    assert(one[Int](Text.wordCount($"t"), "") == 1)
    assert(one[Int](Text.wordCount($"t"), "a  b") == 3) // double space → empty token
  }

  test("bytes = UTF-8 length; char count = codepoints (Python len parity)") {
    assert(one[Int](Text.byteCount($"t"), "héllo") == 6)
    assert(one[Int](Text.charCount($"t"), "héllo") == 5)
    // Non-BMP: Spark length counts codepoints (UTF8String.numChars),
    // matching Python len — SURVEY §7 risk 2 resolved in our favor.
    assert(one[Int](Text.charCount($"t"), "𐍈") == 1)
    assert(one[Int](Text.byteCount($"t"), "𐍈") == 4)
  }

  test("is_number is Unicode-digit aware (Devanagari १२३)") {
    assert(one[Boolean](Text.isNumber($"t"), "१२३"))
    assert(one[Boolean](Text.isNumber($"t"), "0123"))
    assert(!one[Boolean](Text.isNumber($"t"), "12a"))
    assert(!one[Boolean](Text.isNumber($"t"), ""))
  }

  test("terminal punctuation validity incl. exceptions (F5)") {
    assert(one[Boolean](Text.isTerminalValid($"t"), "ok."))
    assert(one[Boolean](Text.isTerminalValid($"t"), "हाँ।"))
    assert(one[Boolean](Text.isTerminalValid($"t"), "शेर॥"))
    assert(!one[Boolean](Text.isTerminalValid($"t"), "wait..."))
    assert(!one[Boolean](Text.isTerminalValid($"t"), "head####"))
    assert(!one[Boolean](Text.isTerminalValid($"t"), "no end"))
  }

  test("lines2doc dedent quirk (A4, setu/utilities.py:116-128 parity)") {
    // Python join_using_symbol: no join separator; a line whose first
    // TWO chars are spaces loses exactly one. Vectors cover: plain,
    // two-space (dedent), one-space (kept), three-space (loses one,
    // keeps two), and the bare-two-spaces line ("  " -> " ").
    def join(lines: Seq[String]): String = {
      val df = lines.zipWithIndex.map { case (l, i) => (i, l) }
        .toDF("pos", "line")
      df.agg(Text.linesToDoc(collect_list(struct($"pos", $"line")))
        .as("doc")).collect()(0).getString(0)
    }
    assert(join(Seq("ab\n", "  cd\n", " e\n", "   f\n", "  ")) ==
      "ab\n cd\n e\n  f\n ")
    // Out-of-order pos is sorted before the join (reference array_sort).
    val shuffled = Seq((2, "  c"), (0, "a"), (1, "b")).toDF("pos", "line")
    assert(shuffled.agg(Text.linesToDoc(collect_list(struct($"pos", $"line"))))
      .collect()(0).getString(0) == "ab c")
  }

  test("ngram builders guard short inputs (sequence(0,-1) hazard)") {
    assert(oneSeq(Text.wordNgrams(split($"t", " "), 5), "a b").isEmpty)
    assert(oneSeq(Text.charNgrams($"t", 4), "abc").isEmpty)
    assert(oneSeq(Text.wordNgrams(split($"t", " "), 2), "a b c") ==
      Seq("a b", "b c"))
    assert(oneSeq(Text.charNgrams($"t", 2), "abc") == Seq("ab", "bc"))
  }

  test("charClassOutRatio counts disallowed chars") {
    assert(one[Double](Text.charClassOutRatio($"t", "[a-z]"), "ab cd") == 0.2)
    assert(one[Double](Text.charClassOutRatio($"t", "[a-z]"), "") == 0.0)
  }

  test("is_num_or_punc_only (F4): numeric or punct-heavy") {
    assert(one[Boolean](Text.isNumOrPuncOnly($"t"), "१२३"))
    assert(one[Boolean](Text.isNumOrPuncOnly($"t"), "!!!###"))
    assert(one[Boolean](Text.isNumOrPuncOnly($"t"), "a-+/=*%$"))
    assert(!one[Boolean](Text.isNumOrPuncOnly($"t"), "normal words here"))
  }

  test("code detection and removal (F6/F7/F8)") {
    val html = "before <div>inner text</div> after"
    val js = "x function foo(a, b) { return a; } y"
    val css = "p .cls { color: red } q"
    assert(one[Boolean](Text.hasCode($"t"), html))
    assert(one[Boolean](Text.hasCode($"t"), js))
    assert(one[Boolean](Text.hasCode($"t"), css))
    assert(!one[Boolean](Text.hasCode($"t"), "plain prose with no markup"))
    assert(one[String](Text.removeCode($"t"), html) == "before  after")
    assert(one[String](Text.removeCode($"t"), js) == "x  y")
    assert(one[String](Text.removeCode($"t"), css) == "p  q")
  }

  test("jaccard on shingle sets") {
    val df = Seq(("a b c d", "a b c e")).toDF("x", "y")
    val j = df.select(Text.jaccard(
      Text.shingleSet($"x", 2), Text.shingleSet($"y", 2)).as("j"))
      .collect()(0).getAs[Double]("j")
    // bigrams x: {a b, b c, c d}; y: {a b, b c, c e}; inter 2, union 4
    assert(j == 0.5)
  }

  test("trivial_tokenize: IndicNLP rule parity (F18 tokenizer)") {
    // Vectors generated from the Python reference rule
    // (re.sub(r'([punct+dandas])', r' \1 ', text.replace('\t',' ')),
    //  collapse spaces, strip(' '), split(' ')).
    def tok(t: String) = oneSeq(Text.trivialTokenize($"t"), t)
    assert(tok("hello, world! its a test") ==
      List("hello", ",", "world", "!", "its", "a", "test"))
    assert(tok("don't stop") == List("don", "'", "t", "stop"))
    assert(tok("रही। घर॥ चला") == List("रही", "।", "घर", "॥", "चला"))
    assert(tok("a  b") == List("a", "b")) // space runs collapse (unlike tokens())
    assert(tok("") == List(""))           // ''.split(' ') parity
    assert(tok("...") == List(".", ".", "."))
    assert(tok("x\ty") == List("x", "y")) // tab → space
    assert(tok("a\nb") == List("a\nb"))   // newline is NOT a split point
    assert(tok(" lead trail ") == List("lead", "trail"))
    // the library's string.punctuation-in-class quirk: '\' never splits
    assert(tok("(x)[y]\\w") ==
      List("(", "x", ")", "[", "y", "]", "\\w"))
  }

  test("PII masking: emails, 4-4-4 ids, intl phones; placeholders never re-match") {
    def mask(t: String) = one[String](Text.maskPii($"t"), t)
    assert(mask("write a@b.co now") == "write <EMAIL> now")
    assert(mask("first.last+tag@sub.example.co.in") == "<EMAIL>")
    assert(mask("id 1234 5678 9012 ok") == "id <ID> ok")
    assert(mask("call +91 98765 43210") == "call <PHONE>")
    assert(mask("a@b.io c@d.ai") == "<EMAIL> <EMAIL>")
    // a phone is NOT a 4-4-4 id (5-5 digit groups) and vice versa
    assert(mask("+1 12345 67890 and 1111 2222 3333") == "<PHONE> and <ID>")
    // untouched text passes through
    assert(mask("no pii here 123") == "no pii here 123")
  }

  test("corpus boilerplate: lines in >= minDocs distinct docs removed, order kept") {
    val docs = Seq(
      (0L, "title zero\ncommon footer\nbody a"),
      (1L, "title one\ncommon footer\nbody b"),
      (2L, "title two\ncommon footer\nbody c\ncommon footer"),
      (3L, "title three\nbody d")
    ).toDF("doc_id", "text")
    val got = graft.ops.Boilerplate
      .removeRepeatedLines(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, String, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(got(0L) == ("title zero\nbody a", 1L))
    assert(got(1L) == ("title one\nbody b", 1L))
    // duplicate occurrences within one doc count once for distinct-docs
    // but every occurrence is removed
    assert(got(2L) == ("title two\nbody c", 2L))
    assert(got(3L) == ("title three\nbody d", 0L))
  }

  test("extractHtmlText: script/style/comment drop, blocks→lines, entities") {
    def ex(t: String) = one[String](Text.extractHtmlText($"t"), t)
    assert(ex("<p>hello</p><p>world</p>") == "hello\nworld")
    assert(ex("<script>if (a < b) { alert('x') }</script>keep") == "keep")
    assert(ex("<style>.c { k: v }</style><div>d</div>") == "d")
    assert(ex("a <!-- no --> b") == "a b")
    // double-escaped entity decodes ONE level; &amp; decoded last
    assert(ex("&amp;lt;tag&amp;gt; &amp; x") == "&lt;tag&gt; & x")
    assert(ex("<span>in  line</span> join") == "in line join")
    assert(ex("<ul><li>one</li><li>two</li></ul>") == "one\ntwo")
    // attributes with > inside quotes are NOT handled (documented regex
    // limit); plain attributes are
    assert(ex("<a href=\"u\">link</a>") == "link")
  }

  test("trivial_tokenize: Urdu routing pads Urdu marks, not dandas") {
    def tokUr(t: String) = oneSeq(Text.trivialTokenize($"t", "ur"), t)
    assert(tokUr("کیا۔ ہاں، ٹھیک") == List("کیا", "۔", "ہاں", "،", "ٹھیک"))
    assert(tokUr("रही। घर") == List("रही।", "घर")) // dandas NOT in the ur class
  }

  test("deepened lexicon tries stay word-boundary matchers, not substring") {
    import graft.sources.Lexicons
    // the full multilingual union (hundreds of keys after the depth
    // pass) compiled into ONE automaton — flashtext boundary semantics
    // must survive the larger trie
    val union = Lexicons.nsfwUnion().toIndexedSeq
    assert(union.size >= 1400, s"expected deepened union, got ${union.size}")
    // round-9 depth floors (raised after the fifth pass): every tail
    // language must ship a production-scale list, not a token stub
    for ((l, floor) <- Seq("assamese" -> 70, "kannada" -> 100, "marathi" -> 95,
        "nepali" -> 125, "punjabi" -> 70, "urdu" -> 110, "tamil" -> 65,
        "telugu" -> 60, "malayalam" -> 58, "manipuri" -> 182,
        "english" -> 400, "hindi" -> 172))
      assert(Lexicons.nsfw(l).size >= floor,
        s"$l lexicon shrank below $floor: ${Lexicons.nsfw(l).size}")
    val ac = new graft.functions.AhoCorasick(union)
    def hits(t: String): Map[String, Int] =
      union.zip(ac.countMatches(t)).filter(_._2 > 0).toMap
    // Latin: keys inside longer words must NOT match
    assert(hits("the analysis of cocktails and assessment classes") == Map.empty)
    assert(hits("anal cock") == Map("anal" -> 1, "cock" -> 1))
    // Brahmic: a vowel sign continues the word — the short key must not
    // fire inside the longer one; the longer key still counts
    val h = hits("चूतिया बोला")
    assert(h.get("चूत").isEmpty, s"substring hit leaked: $h")
    assert(h.get("चूतिया").contains(1), s"missing whole-word hit: $h")
    // mixed-script text: each script's keys fire only on their words
    val m = hits("porn देखना और चुदाई word")
    assert(m.get("porn").contains(1) && m.get("चुदाई").contains(1), s"$m")
    // round-9 deepened scripts: a lexicon key embedded in an ordinary
    // longer word must stay silent (বালতি = "bucket" contains বাল;
    // ਲੰਨਾਂ continues ਲੰਨ with a vowel sign; குண்டியில் inflects
    // குண்டி) while the standalone token still fires
    val bn = hits("বালতি ভরা জল")
    assert(bn.get("বাল").isEmpty, s"বাল leaked inside বালতি: $bn")
    assert(hits("বাল কথা").get("বাল").contains(1))
    val pa = hits("ਲੰਨਾਂ ਲੰਨ")
    assert(pa.get("ਲੰਨ").contains(1), s"vowel-sign continuation broke: $pa")
    val ta = hits("குண்டியில் குண்டி")
    assert(ta.get("குண்டி").contains(1), s"Tamil inflection broke: $ta")
    val te = hits("లంజకొడుకు అన్నాడు")
    assert(te.get("లంజకొడుకు").contains(1) && te.get("లంజ").isEmpty, s"$te")
    // Meetei Mayek (third-pass script twins: Manipuri is written in
    // both the Bengali script and Meetei Mayek, so the loan entries
    // ship in both): letters are Unicode letters, so boundary
    // semantics carry over — a key inside a longer Meetei word stays
    // silent, the standalone token fires
    val mm = hits("ꯔꯥꯟꯗꯤ ꯑꯃꯥ")
    assert(mm.get("ꯔꯥꯟꯗꯤ").contains(1), s"Meetei Mayek key missed: $mm")
    val mmEmbedded = hits("ꯁꯦꯛꯁꯅꯥ")
    assert(mmEmbedded.get("ꯁꯦꯛꯁ").isEmpty,
      s"Meetei Mayek substring leaked: $mmEmbedded")
    // round-10 depth entries: the new Mayek twin fires standalone but
    // stays silent when a case suffix continues the word; the new
    // romanized loan respects Latin boundaries
    val mm10 = hits("ꯃꯥꯒꯤ ꯃꯥꯒꯤꯗꯥ")
    assert(mm10.get("ꯃꯥꯒꯤ").contains(1), s"round-10 Mayek twin: $mm10")
    val lat10 = hits("saala said saalaam")
    assert(lat10.get("saala").contains(1), s"round-10 Latin loan: $lat10")
  }

  test("url normalize: case, www, :443, trailing slash, utm params, fragment") {
    import graft.ops.Url
    def norm(u: String): String = one[String](Url.normalize($"t"), u)
    assert(norm("HTTP://WWW.Example.COM:443/a/b/?utm_campaign=x&q=1&utm_source=y#z")
      == "https://example.com/a/b?q=1")
    assert(norm("https://example.org") == "https://example.org")
    assert(norm("https://example.org/?utm_source=a") == "https://example.org")
    // utm stripping keeps interior params and re-trims the leading &
    assert(norm("https://e.io/p?utm_a=1&keep=2&utm_b=3") == "https://e.io/p?keep=2")
  }

  test("densityExtract: jusText edge vectors — nav/footer dropped, " +
      "short kept only between goods, neargood promoted by one good side") {
    import graft.ops.Boilerplate
    val stops = graft.sources.Lexicons.stopwords("english")
    // 44 stopword tokens, 180 chars — alone it is neargood (len<=200);
    // with any prefix past 20 chars it crosses lengthHigh into good
    val glue = "and it was the most of all that there had been for this " +
      "to be done so that they were with what it is about when more of " +
      "it can be had by them and for all of us as it must have been"
    def run(html: String): (String, Long, Long) = {
      val r = Boilerplate.densityExtract(
        Seq((1L, html)).toDF("id", "html"), "id", "html", stops)
        .collect()(0)
      (r.getAs[String]("extracted"), r.getAs[Long]("n_blocks"),
        r.getAs[Long]("n_kept"))
    }
    // 1. nav (all links) and footer (half links) are bad; body survives
    val (ex1, nb1, nk1) = run(
      "<div><a href='/'>home page</a> <a href='/p'>all products</a></div>" +
        s"<p>mapreduce shards in the cluster $glue</p>" +
        "<div><a href='/t'>terms of use</a> all rights reserved</div>")
    assert(nb1 == 3 && nk1 == 1, s"($ex1, $nb1, $nk1)")
    assert(ex1.startsWith("mapreduce shards") && ex1.contains("must have been"))
    assert(!ex1.contains("home page") && !ex1.contains("rights reserved"))
    // 2. short between two goods is kept; short next to a bad is not
    val (ex2, _, nk2) = run(
      "<div><a href='/'>all of the links</a></div>" +
        "<h1>stranded headline</h1>" + // short: prev bad → dropped
        s"<p>alpha body paragraph with many details $glue</p>" +
        "<p>see also</p>" + // short: both neighbors good → kept
        s"<p>beta body paragraph with many details $glue</p>")
    assert(nk2 == 3, s"($ex2, $nk2)")
    assert(ex2.contains("see also") && !ex2.contains("stranded headline"))
    // 3. neargood (stopword-rich but <=200 chars) promoted by ONE good
    //    neighbor; the same block alone (edges = bad) is dropped
    val near = "<p>it was all of the most that there had been for this " +
      "and what it is about when more can be had by them</p>" // 105 chars: neargood band
    assert(run(near) == (("", 1L, 0L)), "lone neargood must drop (edges bad)")
    val (ex3, _, nk3) = run(s"<p>gamma body paragraph with many details $glue</p>" + near)
    assert(nk3 == 2 && ex3.contains("it was all of the most"), s"($ex3, $nk3)")
    // 4. short with any link text is bad even between goods
    val (ex4, _, nk4) = run(
      s"<p>alpha body paragraph with many details $glue</p>" +
        "<p><a href='/x'>tiny link</a></p>" +
        s"<p>beta body paragraph with many details $glue</p>")
    assert(nk4 == 2 && !ex4.contains("tiny link"), s"($ex4, $nk4)")
    // 5. script/style/comment chrome never reaches classification
    val (ex5, nb5, _) = run(
      "<script>var the = of && and;</script><style>p{}</style>" +
        s"<!-- the of and --><p>delta body paragraph with many details $glue</p>")
    assert(nb5 == 1 && ex5.startsWith("delta body"), s"($ex5, $nb5)")
    // 6. all-bad page extracts to empty string, not null
    assert(run("<div><a href='/'>only a nav</a></div>") == (("", 1L, 0L)))
  }

  test("url host/domain/path depth: ports, subdomains, root path") {
    import graft.ops.Url
    def host(u: String): String = one[String](Url.host($"t"), u)
    def dom(u: String): String = one[String](Url.registeredDomain($"t"), u)
    def depth(u: String): Long = one[Long](Url.pathDepth($"t"), u)
    assert(host("https://WWW.a.b.example.com/x") == "a.b.example.com")
    assert(dom("https://a.b.example.com/x") == "example.com")
    // non-default ports stay in the host (documented naive behavior)
    assert(host("https://h.io:8080/x") == "h.io:8080")
    assert(depth("https://e.io/a/b/") == 2L)
    assert(depth("https://e.io") == 0L)
  }
}

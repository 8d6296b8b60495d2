package graft

import org.apache.spark.sql.functions._

import graft.expressions.{HtmlExtract, HtmlLinkText}

/** HTML text extraction (native expression): hostile markup — scripts
  * holding <, >, quotes; case/whitespace variants; unterminated
  * constructs; CDATA with embedded markup; entity edge cases including
  * double escaping — pinned against hand-computed expected strings, and
  * the codegen path (DataFrame select) pinned against the kernel.
  */
class HtmlExtractSpec extends SparkTestBase {
  import spark.implicits._

  /** Run through the REAL codegen'd expression, not the kernel. */
  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract(col("h"))).as[String].head()

  private def linkText(html: String): String =
    Seq(html).toDF("h").select(HtmlLinkText(col("h"))).as[String].head()

  test("tags strip to single spaces, whitespace collapses, result trims") {
    assert(extract("<html><body>\n  <h1>Title</h1>\n  <p>a  b</p>\n</body></html>")
      === "Title a b")
    assert(extract("plain text, no markup") === "plain text, no markup")
    assert(extract("<br/><hr>") === "")
  }

  test("script and style elements vanish INCLUDING content — even " +
      "content holding <, >, && and quoted tags") {
    assert(extract("""a<script>if (x < 3 && y > 1) { s = "<p>"; }</script>b""")
      === "a b")
    assert(extract("a<style type=\"text/css\">p > em { color: red; }</style>b")
      === "a b")
    // case-insensitive, attrs on the opener, whitespace in the closer
    assert(extract("a<SCRIPT src=\"x.js\">var q=2;</ScRiPt  >b") === "a b")
    assert(extract("a<STYLE>x</STYLE>b") === "a b")
  }

  test("an UNTERMINATED script degrades to a generic tag: content kept " +
      "(the lazy-regex contract)") {
    assert(extract("a<script>var x = 1; b") === "a var x = 1; b")
    // <scripty> is NOT a script opener (needs '>' or ws after the name)
    assert(extract("a<scripty>content</scripty>b") === "a content b")
  }

  test("comments are removed in document order and swallow markup " +
      "inside them") {
    assert(extract("a<!-- hidden <b>bold</b> stuff -->b") === "a b")
    // unterminated comment with a later '>': generic-tag behavior
    assert(extract("a<!-- oops > b") === "a b")
    // no '>' at all after '<': literal text
    assert(extract("a <!-- forever") === "a <!-- forever")
  }

  test("CDATA unwraps to RAW content — embedded markup chars stay " +
      "literal text (no re-scan of unwrapped content)") {
    assert(extract("a<![CDATA[x < y & z]]>b") === "ax < y & zb")
    assert(extract("a <![CDATA[<b>kept</b>]]> b") === "a <b>kept</b> b")
    // unterminated CDATA: generic-tag fallback (eats to the first '>')
    assert(extract("a<![CDATA[x y") === "a<![CDATA[x y")
  }

  test("named entities decode in ONE non-rescanning pass (double " +
      "escaping yields literal entity text)") {
    assert(extract("x &lt;tag&gt; &quot;q&quot; &apos;a&apos; y")
      === "x <tag> \"q\" 'a' y")
    assert(extract("a&nbsp;&nbsp;b") === "a b", "nbsp joins the ws collapse")
    assert(extract("&amp;lt; &amp;amp;") === "&lt; &amp;")
    assert(extract("&unknown; stays") === "&unknown; stays")
  }

  test("the extended named table: typography, symbols, accents; soft " +
      "hyphen drops; unknown names, wrong case and over-long names " +
      "stay literal") {
    assert(extract("a &mdash; b&hellip; &lsquo;q&rsquo; &ldquo;w&rdquo;")
      === "a — b… ‘q’ “w”")
    assert(extract("co&shy;operate") === "cooperate",
      "the discretionary hyphen vanishes from visible text")
    assert(extract("caf&eacute; &uuml;ber gar&ccedil;on ma&ntilde;ana")
      === "café über garçon mañana")
    assert(extract("&copy; 10&frac12;&deg; &euro;5 &pound;3 2&sup2;")
      === "© 10½° €5 £3 2²")
    // exact case: HTML named refs are case-sensitive
    assert(extract("&MDASH; &Mdash; &mdash;") === "&MDASH; &Mdash; —")
    // name grammar bound: letter + up to 30 alnums; 32+ stays literal
    val longName = "&" + "a" * 32 + ";"
    assert(extract(longName) === longName)
    // digits allowed after the leading letter (frac12), not first
    assert(extract("&1frac2;") === "&1frac2;")
  }

  test("numeric character references: decimal and hex decode, strict " +
      "grammar, invalid forms pass through literally (VERDICT r11)") {
    assert(extract("It&#39;s caf&#233;") === "It's café")
    assert(extract("a &#x27;q&#X27; b") === "a 'q' b")
    assert(extract("dash &#8212; &#x2014; here") === "dash — — here")
    // astral plane: surrogate PAIR in the output, one code point
    assert(extract("&#x1F600;!") === "😀!")
    // overflow (6 hex digits, cp > 0x10FFFF), zero, surrogate: literal
    assert(extract("&#x110000; &#0; &#xD800; &#xDFFF;")
      === "&#x110000; &#0; &#xD800; &#xDFFF;")
    // unterminated, empty, over-long digit runs: literal
    assert(extract("&#12 &#; &#x; &#12345678; &#x1234567;")
      === "&#12 &#; &#x; &#12345678; &#x1234567;")
    // mixed digits without the x prefix: not the grammar, literal
    assert(extract("&#12ab;") === "&#12ab;")
    // C0 controls are invalid (HTML5 exclusion -- also keeps the oracle
    // placeholders unproducible by decode); the max code point decodes
    assert(extract("&#x10FFFF; &#1; &#31; ok")
      === new String(Character.toChars(0x10FFFF)) + " &#1; &#31; ok")
  }

  test("decode is single-pass and non-rescanning: a decoded '&' can " +
      "never seed a second decode (true HTML semantics)") {
    // &#38;amp; = literal '&' + 'amp;' — must NOT double-decode to '&'
    assert(extract("&#38;amp;") === "&amp;")
    assert(extract("&#x26;lt;") === "&lt;")
    // &amp;#39; — amp's '&' is not re-examined: literal &#39;
    assert(extract("&amp;#39;") === "&#39;")
    // plain decoded & with nothing entity-shaped after it
    assert(extract("a &#38; b &#x26; c") === "a & b & c")
    // decoded whitespace joins the collapse
    assert(extract("a&#32;&#9;&#10;b") === "a b")
    // numeric refs inside CDATA content decode too (finish processes
    // the whole visible buffer — same as the oracle's stage order)
    assert(extract("<![CDATA[x &#39; y]]>") === "x ' y")
  }

  test("stray '<' follows the regex contract: literal without a later " +
      "'>', a tag span with one") {
    assert(extract("1 < 2 and 3 > 2") === "1 2", "'< 2 and 3 >' is a tag span")
    assert(extract("1 < 2 and no close") === "1 < 2 and no close")
  }

  test("link text: <a> element contents only, same finishing; <abbr> " +
      "is not a link; multiple links concatenate") {
    val html = """<p>intro</p><a href="/x">first  link</a> mid
      |<abbr>n/a</abbr><A CLASS=nav>second&amp;co</a  > tail""".stripMargin
    // link runs concatenate with NO separator — the same contract as
    // the oracle twin's array_to_string(..., '') — so the density
    // numerator counts exactly the in-link visible chars
    assert(linkText(html) === "first linksecond&co")
    assert(extract(html) === "intro first link mid n/a second&co tail")
    assert(linkText("<p>no links at all</p>") === "")
    // an unclosed <a> runs to end of document, like the scanner's
    // inLink flag (a boilerplate page fragment is usually link-dense
    // anyway — the conservative reading for a density signal)
    assert(linkText("<a>x</p>y") === "x y")
  }

  test("block text: block-level tags emit the U+001C separator, inline " +
      "tags stay spaces, name boundaries are exact") {
    def blocks(html: String): Seq[String] =
      Seq(html).toDF("h")
        .select(graft.expressions.HtmlBlockText(col("h"))).as[String].head()
        .split('\u001C').map(_.trim).filter(_.nonEmpty).toSeq
    assert(blocks("<h1>Title</h1><p>first para</p><p>second</p>")
      === Seq("Title", "first para", "second"))
    // inline markup does NOT split a block; block closers/openers do
    assert(blocks("<p>a <b>bold</b> <a href='/x'>link</a> tail</p><div>nav</div>")
      === Seq("a bold link tail", "nav"))
    // self-closing + case variants split; <param>/<pre*> name
    // boundaries are exact (param is not p, pricing is not pre)
    assert(blocks("one<BR/>two<Hr >three") === Seq("one", "two", "three"))
    assert(blocks("x<param value=1>y<pricing>z") === Seq("x y z"))
    // the main-content shape: chrome blocks around one dense block
    assert(blocks("<div>nav nav</div><p>the article body text</p><div>footer</div>")
      === Seq("nav nav", "the article body text", "footer"))
  }

  test("block link text shares the U+001C framing: per-block link mass " +
      "drops the nav block and keeps the article (VERDICT r12 item 3)") {
    def framed(html: String): (Seq[String], Seq[String]) = {
      val row = Seq(html).toDF("h")
        .select(graft.expressions.HtmlBlockText(col("h")).as("b"),
          graft.expressions.HtmlBlockLinkText(col("h")).as("l"))
        .as[(String, String)].head()
      // split with limit -1: Java's default drops TRAILING empty
      // pieces, which would misalign the zip exactly when a document
      // ends in block closers — the engine face's Spark split keeps them
      (row._1.split("\u001C", -1).map(_.trim).toSeq,
        row._2.split("\u001C", -1).map(_.trim).toSeq)
    }
    val page = "<div><a href='/1'>Home</a> <a href='/2'>About</a></div>" +
      "<p>The article body has many words and <a href='/x'>one link</a>.</p>" +
      "<div><a href='/c'>Contact</a></div>"
    val (blocks, links) = framed(page)
    // SAME framing: equal split counts, index-aligned
    assert(blocks.size === links.size)
    val pairs = blocks.zip(links).filter(_._1.nonEmpty)
    assert(pairs.map(_._1) === Seq("Home About",
      "The article body has many words and one link .", "Contact"))
    // inter-link text is OUTSIDE the link stream: links concatenate
    // with no separator, the whole-page HtmlLinkText contract
    assert(pairs.map(_._2) === Seq("HomeAbout", "one link", "Contact"))
    // density gate (1/3 ppm threshold): nav blocks are all-link, the
    // article block is sparse — exactly what the whole-page density
    // cannot separate
    val ppm = pairs.map { case (b, l) => l.length * 1000000L / b.length }
    assert(ppm.map(_ <= 333333L) === Seq(false, true, false))
    // a block-level tag INSIDE a link marks both streams once — the
    // framing invariant that keeps the zip index-aligned
    val (b2, l2) = framed("<a>pre<p>in-link para</p>post</a><p>tail</p>")
    assert(b2.size === l2.size)
    // no links at all: link stream is pure markers
    val (b3, l3) = framed("<p>one</p><p>two</p>")
    assert(b3.size === l3.size && l3.forall(_.isEmpty))
  }

  test("CDATA stage-order corner is PINNED to the scanner's document-" +
      "order result (out-of-contract vs the oracle twin by design)") {
    // a comment opener precedes a CDATA opener whose content holds the
    // comment closer: the scanner resolves the COMMENT first (document
    // order) — the comment swallows the CDATA opener and ends at the
    // closer inside what the oracle would read as CDATA content; the
    // oracle's stage order would unwrap the CDATA first. This test pins
    // the engine side of the declared divergence (VERDICT r12 item 6);
    // the fixture lint below keeps the pattern out of every fixture.
    assert(extract("a<!-- <![CDATA[ -->x]]>b") === "a x]]>b")
    // the non-interleaved neighbors stay in-contract on both sides
    assert(extract("a<!-- c --><![CDATA[ <b> ]]>d") === "a <b> d")
    assert(extract("a<![CDATA[ <!-- ]]>b -->c") === "a <!-- b -->c")
  }

  test("fixture lint: no oracle fixture contains the declared " +
      "out-of-contract corners (CDATA/comment interleave, attribute-" +
      "embedded block tags)") {
    // comment-CDATA interleave risk: a CDATA opener between a comment
    // opener and that comment's first closer (or in an unterminated
    // comment) — conservative over the exact divergence condition
    def cdataInterleave(s: String): Boolean = {
      var i = s.indexOf("<!--")
      while (i >= 0) {
        val close = s.indexOf("-->", i + 4)
        val cd = s.indexOf("<![CDATA[", i + 4)
        if (cd >= 0 && (close < 0 || cd < close)) return true
        if (close < 0) return false
        i = s.indexOf("<!--", close + 3)
      }
      false
    }
    // attribute-embedded block-tag risk, oracle stage order: after the
    // element strips (CDATA/comment/script/style removed) a '<' inside
    // a tag span followed by a block-tag name would get the oracle's
    // U+001C while the scanner spans over it — conservative detector
    def attrEmbeddedBlockTag(s: String): Boolean = {
      val stripped = s
        .replaceAll("(?s)<!\\[CDATA\\[.*?\\]\\]>", " ")
        .replaceAll("(?s)<!--.*?-->", " ")
        .replaceAll("(?is)<script(\\s[^>]*)?>.*?</script\\s*>", " ")
        .replaceAll("(?is)<style(\\s[^>]*)?>.*?</style\\s*>", " ")
      val names = graft.expressions.HtmlText.blockTags.mkString("|")
      java.util.regex.Pattern
        .compile(s"(?is)<[^<>]*</?($names)([\\s/>]|$$)")
        .matcher(stripped).find()
    }
    // self-check on the known divergent shapes
    assert(cdataInterleave("x<!-- <![CDATA[ -->y]]>z"))
    assert(cdataInterleave("x<!-- <![CDATA[ never closed"))
    assert(attrEmbeddedBlockTag("""<img alt="<p>">"""))
    assert(!cdataInterleave("a<!-- c --><![CDATA[ <b> ]]>d"))
    assert(!attrEmbeddedBlockTag("<p>a <b>bold</b></p><script>x = \"<p>\";</script>"))
    // the REAL fixtures, materialized through the same Column the faces
    // use (doc ids cover the %3/%4 fixture branches)
    val docs = Seq((0L, "alpha beta gamma"), (1L, "delta words here"),
        (3L, "epsilon zeta"), (6L, "eta theta iota"))
      .toDF("doc_id", "text")
    for (fx <- Seq(graft.queries.TextQueries.htmlFixture,
        graft.queries.TextQueries.htmlCrawlFixture)) {
      val rendered = docs.select(fx.as("h")).as[String].collect()
      rendered.foreach { h =>
        assert(!cdataInterleave(h), s"fixture holds the CDATA corner: $h")
        assert(!attrEmbeddedBlockTag(h),
          s"fixture holds an attribute-embedded block tag: $h")
      }
    }
  }

  test("null input yields null; empty input yields empty") {
    val out = Seq[Option[String]](None, Some(""))
      .toDF("h").select(HtmlExtract(col("h"))).as[Option[String]].collect()
    assert(out.toSeq === Seq(None, Some("")))
  }

  test("multi-byte content passes through untouched (scan is ASCII-structural)") {
    assert(extract("<p>héllo wörld — 東京</p>") === "héllo wörld — 東京")
  }
}

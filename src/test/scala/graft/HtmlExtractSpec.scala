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

  test("fixed entity set decodes, &amp; LAST (double escaping yields " +
      "literal entity text)") {
    assert(extract("x &lt;tag&gt; &quot;q&quot; &apos;a&apos; y")
      === "x <tag> \"q\" 'a' y")
    assert(extract("a&nbsp;&nbsp;b") === "a b", "nbsp joins the ws collapse")
    assert(extract("&amp;lt; &amp;amp;") === "&lt; &amp;")
    assert(extract("&unknown; stays") === "&unknown; stays")
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

  test("null input yields null; empty input yields empty") {
    val out = Seq[Option[String]](None, Some(""))
      .toDF("h").select(HtmlExtract(col("h"))).as[Option[String]].collect()
    assert(out.toSeq === Seq(None, Some("")))
  }

  test("multi-byte content passes through untouched (scan is ASCII-structural)") {
    assert(extract("<p>héllo wörld — 東京</p>") === "héllo wörld — 東京")
  }
}

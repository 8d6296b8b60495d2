package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the dedup key a crawl pipeline computes
  * BEFORE any content-level dedup: the same page is fetched as
  * `HTTP://Example.COM:80/a?utm_source=feed&b=2&a=1#top` and
  * `http://example.com/a?a=1&b=2`, and without a canonical form every
  * downstream stage (frontier dedup, recrawl scheduling, per-URL
  * aggregation) double-counts it. One deterministic string rewrite, no
  * network, no IDN/punycode (a lookup table, not normalization):
  *
  *   - scheme and authority lowercase (userinfo, when present, is
  *     lowercased with the authority — acceptable for a dedup KEY);
  *   - default ports strip (`:80` for http, `:443` for https);
  *     non-default ports are kept;
  *   - the fragment is dropped (never sent to the server);
  *   - an empty path becomes `/`;
  *   - percent-encoding normalizes per RFC 3986 §6.2.2 (one
  *     left-to-right pass over the whole URL, BEFORE the other
  *     rewrites): an escape whose octet is an unreserved character
  *     (ALPHA / DIGIT / `-` `.` `_` `~`) DECODES (`%7E` → `~`); any
  *     other escape keeps its `%` and uppercases its hex digits
  *     (`%2f` → `%2F`); a `%` not followed by two hex digits stays
  *     literal. Decoded output is never re-examined, so
  *     double-encoding (`%2541`) is NOT re-decoded — `%25` is a
  *     reserved octet and keeps its escape. These are the two biggest
  *     dedup-key fragmenters; decoding RESERVED octets stays out (it
  *     changes URL structure — a server-semantics gamble);
  *   - path case is preserved AS-IS (paths are case-sensitive);
  *   - query parameters: empty params drop, tracking params drop
  *     (`utm_*` prefix and the [[UrlText.trackingParams]] set), the
  *     remainder SORTS bytewise on the full `k=v` text and rejoins
  *     with `&`; an emptied query drops its `?`.
  *
  * Inputs without a `scheme://` prefix are returned unchanged —
  * relative references have no canonical absolute form without a base,
  * and a dedup key must never invent one.
  *
  * Native codegen'd expression (the HtmlExtract precedent) registered
  * as SQL function `graft_url_normalize`; the DuckDB oracle twin
  * re-derives the exact rewrite from the same rules
  * (TextQueries.urlNormSql).
  */
object UrlText {

  /** Exact-name tracking parameters dropped from query strings (the
    * `utm_` prefix family is dropped by prefix). PUBLIC — the oracle
    * twin generates its filter from this list.
    */
  val trackingParams: Seq[String] = Seq("fbclid", "gclid", "msclkid", "ref")

  private val trackingSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    trackingParams.foreach(s.add)
    s
  }

  private def isDefaultPort(scheme: String, port: String): Boolean =
    (scheme == "http" && port == "80") || (scheme == "https" && port == "443")

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def isUnreserved(v: Int): Boolean =
    (v >= '0' && v <= '9') || (v >= 'A' && v <= 'Z') ||
      (v >= 'a' && v <= 'z') || v == '-' || v == '.' || v == '_' || v == '~'

  private def upperHex(c: Char): Char =
    if (c >= 'a' && c <= 'f') (c - 32).toChar else c

  /** RFC 3986 §6.2.2 percent-encoding normalization, ONE left-to-right
    * pass (see class doc). Escapes never overlap (hex digits are never
    * `%`), so this scan is exactly the oracle twin's split-on-`%`
    * piece transform — each piece after the first is one `%` plus its
    * tail, examined independently.
    */
  private def pctNormalize(u: String): String = {
    var i = u.indexOf('%')
    if (i < 0) return u
    val n = u.length
    val sb = new java.lang.StringBuilder(n)
    sb.append(u, 0, i)
    while (i < n) {
      val c = u.charAt(i)
      if (c != '%' || i + 2 >= n) { sb.append(c); i += 1 }
      else {
        val hi = hexVal(u.charAt(i + 1))
        val lo = hexVal(u.charAt(i + 2))
        if (hi < 0 || lo < 0) { sb.append(c); i += 1 }
        else {
          val v = (hi << 4) | lo
          if (isUnreserved(v)) sb.append(v.toChar)
          else sb.append('%').append(upperHex(u.charAt(i + 1)))
            .append(upperHex(u.charAt(i + 2)))
          i += 3
        }
      }
    }
    sb.toString
  }

  def normalize(url: UTF8String): UTF8String = {
    val u = url.toString
    val sep = u.indexOf("://")
    // scheme grammar: letter then letters/digits/+/-/. — anything else
    // is not an absolute URL, return unchanged
    if (sep <= 0) return url
    var ok = (u.charAt(0) >= 'a' && u.charAt(0) <= 'z') ||
      (u.charAt(0) >= 'A' && u.charAt(0) <= 'Z')
    var si = 1
    while (ok && si < sep) {
      val c = u.charAt(si)
      ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      si += 1
    }
    if (!ok) return url
    // percent-normalize the WHOLE string first (scheme chars exclude
    // '%', so positions up to `sep` are unchanged); later stages then
    // see canonical octets — a decoded param name can reveal a
    // tracking param, and the bytewise param sort orders decoded text
    val un = pctNormalize(u)
    val scheme = un.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = un.substring(sep + 3)
    var ai = 0
    while (ai < rest.length && rest.charAt(ai) != '/' &&
      rest.charAt(ai) != '?' && rest.charAt(ai) != '#') ai += 1
    var authority = rest.substring(0, ai).toLowerCase(java.util.Locale.ROOT)
    val colon = authority.lastIndexOf(':')
    if (colon >= 0 && colon > authority.lastIndexOf(']') &&
        isDefaultPort(scheme, authority.substring(colon + 1)))
      authority = authority.substring(0, colon)
    // path + query, fragment dropped
    var tail = rest.substring(ai)
    val hash = tail.indexOf('#')
    if (hash >= 0) tail = tail.substring(0, hash)
    val qm = tail.indexOf('?')
    var path = if (qm >= 0) tail.substring(0, qm) else tail
    if (path.isEmpty) path = "/"
    val query =
      if (qm < 0) ""
      else {
        val params = tail.substring(qm + 1).split("&", -1).toSeq
          .filter { p =>
            val name = { val e = p.indexOf('='); if (e >= 0) p.substring(0, e) else p }
            p.nonEmpty && !name.startsWith("utm_") && !trackingSet.contains(name)
          }
          .sorted
        if (params.isEmpty) "" else params.mkString("?", "&", "")
      }
    UTF8String.fromString(scheme + "://" + authority + path + query)
  }
}

/** Canonical form of an absolute URL (see [[UrlText]] rules). */
case class UrlNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_url_normalize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_normalize"
  override protected def nullSafeEval(input: Any): Any =
    UrlText.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UrlText.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlNormalize =
    copy(child = newChild)
}

object UrlNormalize {
  def apply(c: Column): Column = Shim.column(UrlNormalize(Shim.expression(c)))
}

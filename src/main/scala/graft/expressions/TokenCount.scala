package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for whitespace token counting —
  * semantically identical to the engine's canonical
  * `size(split(trim(text), "\s+"))` (TextAnalysis.tokens), including
  * its one quirk: a whitespace-only/empty string counts 1, because
  * `split` of an empty string yields `[""]`.
  *
  * Why a custom expression (build-brief preference order (b)): the
  * split-based formulation materializes the full token ARRAY — one
  * UTF8String slice per token plus the array shell — only to read its
  * length and discard it. Token counts are computed once per document
  * in token stats, quality scoring, sequence packing, and length
  * quantiles; at 100 TB that is billions of transient arrays on the
  * hot path. This expression is a single allocation-free scan over the
  * string's UTF-8 bytes, JIT'd inside whole-stage codegen.
  *
  * Whitespace here is exactly Java-regex `\s` = [ \t\n\x0B\f\r] — NOT
  * `Character.isWhitespace` (which also accepts U+001C–1F separators)
  * and NOT Unicode spaces like NBSP, so the count always agrees with
  * the split formulation and the DuckDB oracle's
  * `regexp_split_to_array(trim(text), '\s+')`. All six separator chars
  * are single-byte in UTF-8, so the scan can run on raw bytes without
  * decoding code points.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_count requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Exact replay of `size(split(trim(s), "\s+"))`, which has three
    * subtleties the obvious "count runs" misses:
    *  - Spark `trim` strips ONLY ASCII space 0x20 — tabs/newlines at
    *    the ends survive it;
    *  - Spark `split` (limit -1) keeps leading AND trailing empty
    *    fields, so surviving edge whitespace contributes one empty
    *    token per side;
    *  - the empty trimmed string splits to `[""]`, count 1.
    */
  def count(s: UTF8String): Long = {
    val n = s.numBytes()
    var lo = 0
    while (lo < n && s.getByte(lo) == ' ') lo += 1
    var hi = n
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1
    if (lo == hi) return 1L // empty after space-trim: split("") -> [""]
    var tokens = 0L
    if (isSpace(s.getByte(lo))) tokens += 1     // leading empty field
    if (isSpace(s.getByte(hi - 1))) tokens += 1 // trailing empty field
    var inToken = false
    var i = lo
    while (i < hi) {
      val sp = isSpace(s.getByte(i))
      if (!sp && !inToken) { tokens += 1; inToken = true }
      else if (sp) inToken = false
      i += 1
    }
    tokens
  }

  /** Column builder usable anywhere a built-in function is. */
  def apply(c: Column): Column = Shim.column(TokenCount(Shim.expression(c)))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-token rolling-hash array over whitespace tokens —
  * value-identical to the engine's canonical HOF pipeline
  * `transform(split(trim(text), "\s+"), h => RollingHash(h))`
  * (TextAnalysis.tokenHashTable), including every split artifact the
  * [[TokenCount]] scan documents:
  *  - Spark `trim` strips ONLY ASCII space 0x20;
  *  - `split` (limit −1) keeps leading AND trailing empty fields when
  *    edge whitespace survives the trim — each contributes hash("") = 0;
  *  - the empty trimmed string splits to `[""]`, one zero hash.
  *
  * Why a custom expression (build-brief preference order (b), the
  * TokenCount rationale, r13 optimization round): the HOF pipeline pays
  * a Java-regex split that materializes the full token STRING array —
  * one UTF8String slice + object header per token — and then an
  * interpreted `transform` dispatch per element, only for every
  * consumer to read the 8-byte hash and drop the strings. This is one
  * allocation-light pass: a single byte scan finds token boundaries
  * (all six `\s` separators are single-byte in UTF-8, and UTF-8
  * continuation bytes are ≥ 0x80, so byte scanning can never split a
  * multi-byte code point), and each token hashes through the SAME
  * [[RollingHash.hash]] the HOF form uses — parity by construction,
  * spec-pinned in TextAnalysisSpec. It is the first stage of every
  * text/dedup pipeline (shingling, MinHash, winnowing, TF-IDF), called
  * once per document at 100 TB.
  */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_hashes requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TokenHashes.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenHashes.hashes($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

object TokenHashes {

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Exact replay of `transform(split(trim(s), "\s+"), RollingHash.hash)`
    * — the trim/split subtleties mirror [[TokenCount.count]] line by
    * line; the per-token fold IS [[RollingHash.hash]] over a zero-copy
    * byte view.
    */
  def hashes(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    var lo = 0
    while (lo < n && s.getByte(lo) == ' ') lo += 1
    var hi = n
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1
    if (lo == hi) return new GenericArrayData(Array(0L)) // split("") -> [""], hash("") = 0
    val bytes = s.getBytes
    var count = 0
    val buf = new Array[Long](TokenCount.count(s).toInt)
    if (isSpace(bytes(lo))) { buf(count) = 0L; count += 1 } // leading empty field
    var i = lo
    while (i < hi) {
      while (i < hi && isSpace(bytes(i))) i += 1
      if (i < hi) {
        val start = i
        while (i < hi && !isSpace(bytes(i))) i += 1
        buf(count) = RollingHash.hash(UTF8String.fromBytes(bytes, start, i - start))
        count += 1
      }
    }
    if (isSpace(bytes(hi - 1))) { buf(count) = 0L; count += 1 } // trailing empty field
    new GenericArrayData(buf)
  }

  /** Column builder usable anywhere a built-in function is. */
  def apply(c: Column): Column = Shim.column(TokenHashes(Shim.expression(c)))
}

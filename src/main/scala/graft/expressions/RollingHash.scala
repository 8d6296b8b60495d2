package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial rolling hash:
  * fold acc*31 + codepoint mod 1e9+7 over a string's characters —
  * semantically identical to the higher-order-function formulation
  * (`aggregate(split(s,""), ...)`) and to the DuckDB oracle's
  * `list_reduce` fold.
  *
  * Why a custom expression (build-brief preference order (b)): the HOF
  * fold runs in Catalyst's interpreted lambda evaluator — per character
  * it allocates a one-char UTF8String, boxes the accumulator, and
  * dispatches the lambda. This expression is a tight JIT'd loop with
  * `doGenCode`, participating in whole-stage codegen, and is the hot
  * inner loop of every text/dedup pipeline (called once per token per
  * document at 100 TB).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  val Mod: Long = 1000000007L

  /** The fold, shared by interpreted eval and generated code. Iterates
    * Unicode CODE POINTS (not UTF-16 code units), matching the `ascii()`
    * per-codepoint semantics of the HOF formulation and the DuckDB
    * oracle's `string_split + ascii` fold — including for non-BMP text
    * (emoji etc., common in LLM training corpora), where a charAt-based
    * fold would hash the two surrogate halves separately.
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column builder usable anywhere a built-in function is — including
    * inside higher-order-function lambdas.
    */
  def apply(c: Column): Column = Shim.column(RollingHash(Shim.expression(c)))
}

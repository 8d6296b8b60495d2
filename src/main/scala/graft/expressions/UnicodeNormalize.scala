package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode-normalization expression (NFC/NFD/NFKC/NFKD) — the
  * first transform of any text-curation pipeline: the same user-visible
  * string has many byte encodings (precomposed é vs e+combining acute,
  * compatibility ligatures, width variants), and every downstream
  * operator keyed on text bytes — exact dedup canon hashes, shingle
  * hashes, token counts — silently fragments unless the corpus is
  * normalized first. Spark has no built-in; a Scala UDF would leave
  * whole-stage codegen, so this wraps the JDK normalizer as a codegen'd
  * expression (build-brief preference order (b)). The common-case cost
  * is one `isNormalized` scan, no allocation (NFC'd real-world text is
  * overwhelmingly already normalized).
  *
  * The `form` is a case-class field (not a child expression): it is
  * compile-time metadata, so each codegen'd call site pins its form as
  * a constant.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"unknown normalization form $form (expected one of ${UnicodeNormalize.Forms.keys.mkString(", ")})")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_unicode_normalize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.expressions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  val Forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)

  /** Shared by interpreted eval and generated code. The isNormalized
    * fast path skips the String round-trip for already-normal input.
    */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Forms(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def apply(c: Column, form: String): Column =
    Shim.column(UnicodeNormalize(Shim.expression(c), form))
}

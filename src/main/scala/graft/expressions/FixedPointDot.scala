package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native fixed-point dot product: Σ floor(a_i · b_i · 1e6) as BIGINT —
  * semantically identical to the HOF formulation
  * (`aggregate(zip_with(a, b, floor(x·y·1e6)), 0L, +)`, kept as
  * [[graft.similarity.Similarity.dotFpHof]]) and to the DuckDB oracle's
  * `list_sum(list_transform(list_zip(...)))`.
  *
  * Why a custom expression (preference order (b)): higher-order lambdas
  * run in Catalyst's interpreted evaluator — per element they allocate,
  * box the accumulator, and dispatch two lambdas; `zip_with` also
  * materializes an intermediate array per row. This is the hot inner
  * loop of every similarity path (brute-force scoring, LSH/IVF cosine,
  * k-means assignment — dims × candidates × queries evaluations at
  * 100 TB). Here it is one fused JIT'd loop over the two ArrayData
  * buffers inside whole-stage codegen, no intermediate array.
  *
  * Mixed float/double element types are supported (embeddings are
  * float; refined IVF centroids are double); elements are widened to
  * double exactly as `cast` would. Shorter-array semantics match
  * zip_with's null-padding: a null element (or padding past the shorter
  * array) makes that product null, which the HOF sum treats as +null →
  * the whole sum null; here we mirror by returning null if lengths
  * differ or any touched element is null.
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_fp_dot requires array<float|double> args, got " +
          s"${left.dataType} and ${right.dataType}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fp_dot"

  @transient private lazy val leftDouble =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  @transient private lazy val rightDouble =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightDouble) y.getDouble(i) else y.getFloat(i).toDouble
      acc += math.floor(xv * yv * 1000000.0).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getL = if (leftDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val getR = if (rightDouble) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) java.lang.Math.floor($getL * $getR * 1000000.0);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}

object FixedPointDot {
  def apply(a: Column, b: Column): Column =
    Shim.column(FixedPointDot(Shim.expression(a), Shim.expression(b)))
}

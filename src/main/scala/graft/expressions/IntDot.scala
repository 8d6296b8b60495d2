package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native integer dot product over int arrays: Σ a_i · b_i as BIGINT —
  * the scoring inner loop of the int8-quantized search path
  * (graft.similarity.Similarity.quantizedTopK), semantically identical
  * to the HOF formulation `aggregate(zip_with(a, b, (x,y) => (x·y)
  * cast long), 0L, +)` and to the DuckDB oracle's
  * `list_sum(list_transform(list_zip(...)))`.
  *
  * Same rationale as [[FixedPointDot]] (the float/double twin): the
  * higher-order lambdas run interpreted, allocate an intermediate
  * zipped array, and box the accumulator per element — this is one
  * fused JIT'd loop inside whole-stage codegen. Products are widened
  * to long BEFORE summing (int8 codes bound each product by 127², but
  * the expression accepts any int arrays, so the widening is load-
  * bearing, and it matches the BIGINT casts in both twins). Null/length
  * semantics mirror zip_with: length mismatch or any touched null
  * element → null.
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // int arrays widen element-wise; long arrays (the GD training
  // features/weights) ride the same fused loop — each side's getter is
  // resolved once at plan time from its array element type. Long·long
  // products can overflow silently: the caller's fixed-point scale is
  // the headroom contract, exactly as in ml.Training / ml.Regression.
  private def isIntegralArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _ => false
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isIntegralArray(left) && isIntegralArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_int_dot requires array<int|bigint> args, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val xl = isLongArray(left)
    val yl = isLongArray(right)
    var acc = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xl) x.getLong(i) else x.getInt(i).toLong
      val yv = if (yl) y.getLong(i) else y.getInt(i).toLong
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getX = if (isLongArray(left)) s"$a.getLong($i)" else s"(long) $a.getInt($i)"
      val getY = if (isLongArray(right)) s"$b.getLong($i)" else s"(long) $b.getInt($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $getX * $getY;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  def apply(a: Column, b: Column): Column =
    Shim.column(IntDot(Shim.expression(a), Shim.expression(b)))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native sign-bit hyperplane bucket for LSH: bit p of the result is
  * set iff Σ_d floor(x_d · w(p,d)) > 0, with the deterministic integer
  * pseudo-hyperplane w(p,d) = ((p·64 + 1 + d) · 2654435761) mod 1000003
  * − 501001 — value-identical to the HOF formulation
  * ([[graft.similarity.Similarity.lshBucketHof]]) and the DuckDB
  * oracle's indexed-lambda projections.
  *
  * Why a custom expression: the HOF form runs nPlanes interpreted
  * aggregate-over-zip_with folds per vector and materializes a dims
  * index array for each — per LSH table. Bucketing is map-side but
  * touches EVERY vector (candidates × tables at 100 TB); this fuses all
  * planes into one JIT'd pass over the array buffer.
  */
case class LshBucket(child: Expression, nPlanes: Int) extends UnaryExpression {

  require(nPlanes > 0 && nPlanes <= 62, s"nPlanes out of range: $nPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket requires an array<float|double> argument, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  @transient private lazy val isDouble =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    LshBucket.bucket(a, nPlanes, isDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LshBucket.bucket($c, $nPlanes, $isDouble)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {

  /** One pass over the array, all planes accumulated. Null elements
    * contribute the HOF's null-poisoning: any null makes every plane's
    * sum null → the HOF bucket treats `null > 0` as false; we mirror by
    * treating the projection as non-positive (bit unset) — embeddings
    * with null elements are malformed input either way and the two
    * formulations agree on null-free data (spec-asserted).
    */
  def bucket(a: ArrayData, nPlanes: Int, isDouble: Boolean): Long = {
    val n = a.numElements()
    val acc = new Array[Long](nPlanes)
    var anyNull = false
    var d = 0
    while (d < n && !anyNull) {
      if (a.isNullAt(d)) anyNull = true
      else {
        val x = if (isDouble) a.getDouble(d) else a.getFloat(d).toDouble
        var p = 0
        while (p < nPlanes) {
          val w = ((p.toLong * 64L + 1L + d) * 2654435761L) % 1000003L - 501001L
          acc(p) += math.floor(x * w.toDouble).toLong
          p += 1
        }
      }
      d += 1
    }
    if (anyNull) 0L
    else {
      var bits = 0L
      var p = 0
      while (p < nPlanes) {
        if (acc(p) > 0L) bits |= (1L << p)
        p += 1
      }
      bits
    }
  }

  def apply(c: Column, nPlanes: Int): Column =
    Shim.column(LshBucket(Shim.expression(c), nPlanes))
}

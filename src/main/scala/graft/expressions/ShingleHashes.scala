package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native n-gram shingle hashes over a per-token hash array: output[i] =
  * fold over th[i..i+n-1] of (acc·131 + h) mod 1e9+7, empty array when
  * the document has fewer than n tokens — value-identical to the HOF
  * formulation ([[graft.text.TextAnalysis.shingleHashesHof]]).
  *
  * Why a custom expression: the HOF form runs one interpreted lambda
  * per shingle with n boxed element_at lookups inside — per token per
  * document, the inner loop of MinHash and n-gram-Jaccard candidate
  * generation. This is one JIT'd sliding pass over the hash buffer.
  *
  * Input elements must be non-null (they are computed rolling hashes);
  * a null element throws rather than silently diverging from the HOF.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires an array<bigint> argument, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.hashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  val Mod: Long = 1000000007L

  def hashes(th: ArrayData, n: Int): ArrayData = {
    val t = th.numElements()
    if (t < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](t - n + 1)
    var i = 0
    while (i <= t - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        if (th.isNullAt(i + j))
          throw new IllegalArgumentException(
            "graft_shingle_hashes: null token hash at index " + (i + j))
        h = if (j == 0) th.getLong(i)
          else (h * 131L + th.getLong(i + j)) % Mod
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    Shim.column(ShingleHashes(Shim.expression(c), n))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.text.Bpe

/** Native frozen-tokenizer BPE apply — the production-scale form of
  * [[graft.text.Bpe.applyLearned]]: the fold-chain face nests one fold
  * per merge, which is right for a handful of merges but cannot carry a
  * real vocabulary (tens of thousands); this expression bakes the WHOLE
  * merge table into the plan once (case-class metadata, like the
  * trained-weight matrix of ml.Inference) and runs an imperative kernel
  * per row inside whole-stage codegen.
  *
  * Kernel semantics: repeatedly find the lowest-rank merge whose pair is
  * present and rewrite greedy-leftmost. Equivalent to applying merges in
  * learned order (a merge can only create adjacencies involving its own
  * minted symbol, which earlier merges cannot reference — so no
  * earlier-rank pair ever reappears); the equivalence is spec-asserted
  * against the fold face. Pair lookup is one HashMap probe on the packed
  * (a << 32 | b) key — valid because every symbol (rolling hashes <
  * 2^30, minted ids just above HashMod) fits in 31 bits, which the
  * constructor enforces.
  */
case class BpeApplyExpr(child: Expression, merges: Seq[(Long, Long, Long)])
    extends UnaryExpression {

  require(merges.forall { case (a, b, m) =>
    a >= 0 && b >= 0 && m >= 0 && a < (1L << 31) && b < (1L << 31) && m < (1L << 31) },
    "merge symbols must fit 31 bits for packed-pair lookup")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_apply requires array<bigint> symbols, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bpe_apply"

  @transient private lazy val table = new BpeApplyExpr.Table(merges)

  override protected def nullSafeEval(input: Any): Any =
    table.apply(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeApplyExpr.Table].getName)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.apply($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)
}

object BpeApplyExpr {

  /** Precomputed lookup shared by interpreted eval and generated code:
    * rank per packed pair plus flat merge arrays. Built once per plan
    * (addReferenceObj), reused for every row.
    */
  final class Table(merges: Seq[(Long, Long, Long)]) extends Serializable {
    private val n = merges.length
    private val as = merges.map(_._1).toArray
    private val bs = merges.map(_._2).toArray
    private val ms = merges.map(_._3).toArray
    @transient private lazy val rank: java.util.HashMap[java.lang.Long, Integer] = {
      val h = new java.util.HashMap[java.lang.Long, Integer](n * 2)
      var i = 0
      while (i < n) {
        // first (lowest-rank) definition of a pair wins, matching
        // learned-order application
        h.putIfAbsent((as(i) << 32) | bs(i), i)
        i += 1
      }
      h
    }

    def apply(in: ArrayData): ArrayData = {
      var seq = in.toLongArray()
      var done = n == 0 || seq.length < 2
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i + 1 < seq.length) {
          val r = rank.get((seq(i) << 32) | seq(i + 1))
          if (r != null && r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val a = as(best); val b = bs(best); val m = ms(best)
          val out = new Array[Long](seq.length)
          var w = 0
          var j = 0
          while (j < seq.length) {
            if (j + 1 < seq.length && seq(j) == a && seq(j + 1) == b) {
              out(w) = m; w += 1; j += 2
            } else {
              out(w) = seq(j); w += 1; j += 1
            }
          }
          seq = java.util.Arrays.copyOf(out, w)
          done = seq.length < 2
        }
      }
      new GenericArrayData(seq)
    }
  }

  /** Column face over a learned merge table. */
  def apply(syms: Column, merges: Seq[Bpe.Merge]): Column =
    Shim.column(BpeApplyExpr(Shim.expression(syms),
      merges.sortBy(_.round).map(m => (m.symA, m.symB, m.newSym))))
}

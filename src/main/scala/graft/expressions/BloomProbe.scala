package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native Bloom membership probe against a driver-built word array —
  * the probe-side kernel of [[graft.core.RuntimeFilter]].
  *
  * Semantically identical to the Column formulation it replaced (k
  * double-hashed mid-square positions, 63-bit words — the exact
  * [[graft.sketch.Sketches]] slot grammar, so filters BUILT by the SQL
  * aggregation probe correctly here), but compiled as one imperative
  * kernel: the Column form embedded the whole words array LITERAL and
  * the full 6-pmod hash chain once per probe term, a 4-way conjunction
  * whose expression tree blew past codegen's method budget and ran
  * interpreted — ~4 µs/row, 10× the plain join it was supposed to
  * prune. Here the chain evaluates once, h2 is reused across the k
  * positions, the words live in a referenced object (not the plan
  * tree), and the loop exits on the first cleared bit.
  *
  * Null key → null (the pruned row set matches inner equi-join
  * semantics, which drop null keys).
  */
case class BloomProbe(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")
  require(words.nonEmpty, "empty Bloom word array")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_probe requires a BIGINT key, got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(input: Any): Any =
    BloomProbe.contains(words, input.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BloomProbe.contains($wordsRef, $c, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {

  /** Mirrors [[graft.sketch.Sketches]]: 2³¹−1 modulus, iterated
    * mid-square h1/h2, 63 data bits per word. Any drift from the SQL
    * build grammar is a correctness bug (false NEGATIVES), which
    * RuntimeFilterSpec's pruned==plain equivalence cases would catch.
    */
  private val KeyPrime = 2147483647L
  private val BitsPerWord = 63L

  private def mod(a: Long, m: Long): Long = { val r = a % m; if (r < 0) r + m else r }

  def contains(words: Array[Long], key: Long, k: Int): Boolean = {
    val nBits = words.length * BitsPerWord
    val x = mod(key, KeyPrime)
    val h1a = mod(x * x + 12345L, KeyPrime)
    val h1 = mod(h1a * h1a + 6789L, KeyPrime)
    val h2a = mod((x + 40503L) * (x + 99991L), KeyPrime)
    val h2 = mod(h2a * h2a + 987654321L, KeyPrime)
    var i = 0
    while (i < k) {
      val pos = mod(h1 + i.toLong * h2, nBits)
      if (((words((pos / BitsPerWord).toInt) >> (pos % BitsPerWord).toInt) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }

  def apply(key: Column, words: Array[Long], k: Int): Column =
    Shim.column(BloomProbe(Shim.expression(key), words, k))
}

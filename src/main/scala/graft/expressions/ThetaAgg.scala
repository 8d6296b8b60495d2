package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{Intersection, Sketches => ThetaSketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Theta sketches (Apache DataSketches) — the SET-ALGEBRA member of the
  * mergeable-sketch family. HLL (`Sketches.distinctSketches`) answers
  * distinct counts and unions, but cannot intersect: "distinct users
  * active in BOTH January and February" has no HLL form. Theta sketches
  * carry a hash sample with a threshold, closing the family under
  * union, INTERSECTION and A-NOT-B — the audience-overlap / retention /
  * churn query class over persisted per-batch sketches, no rescan.
  *
  * Error contract: below the nominal-entries threshold (2^lgK) a theta
  * sketch is in EXACT mode — estimates are exact integers, which is
  * what ThetaSpec pins; above it, the published ~1/√(2^lgK) relative
  * error applies and intersections inherit the tighter of the operand
  * bounds. Sketch bytes are engine-specific → rows-only, like HLL/KLL.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_sketch"

  // a Union IS the growable update buffer: it accepts raw updates and
  // other sketches alike, so one buffer type serves update and merge
  override def createAggregationBuffer(): Union =
    ThetaSketches.setOperationBuilder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buffer.update(l)
      case i: Int => buffer.update(i.toLong)
      case s: org.apache.spark.unsafe.types.UTF8String => buffer.update(s.toString)
      case other => buffer.update(other.toString)
    }
    buffer
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult); a
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaSketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Union of persisted theta sketch BYTES rows. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_union"

  override def createAggregationBuffer(): Union =
    ThetaSketches.setOperationBuilder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buffer.union(ThetaSketches.heapifySketch(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaSketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

/** Intersection of persisted theta sketch BYTES rows — the operation
  * HLL cannot express. A virgin intersection is the identity (the
  * universal set), so groups fold in any order/partitioning; merging
  * two partial intersections is `(∩Sa) ∩ (∩Sb) = ∩(Sa ∪ Sb)` — still
  * associative and commutative. An all-null group evaluates to null
  * ("intersection of nothing" has no meaningful sketch).
  *
  * Buffer state crosses the wire as the result-so-far compact sketch
  * prefixed by a has-result marker byte (a virgin Intersection has no
  * serializable result).
  */
case class ThetaIntersectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Intersection] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_intersect"

  override def createAggregationBuffer(): Intersection =
    ThetaSketches.setOperationBuilder().buildIntersection()

  override def update(buffer: Intersection, input: InternalRow): Intersection = {
    val v = child.eval(input)
    if (v != null)
      buffer.intersect(ThetaSketches.heapifySketch(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(a: Intersection, b: Intersection): Intersection = {
    if (b.hasResult) a.intersect(b.getResult)
    a
  }

  override def eval(buffer: Intersection): Any =
    if (buffer.hasResult) buffer.getResult.toByteArray else null

  override def serialize(buffer: Intersection): Array[Byte] =
    if (buffer.hasResult) {
      val r = buffer.getResult.toByteArray
      val out = new Array[Byte](r.length + 1)
      out(0) = 1
      System.arraycopy(r, 0, out, 1, r.length)
      out
    } else Array[Byte](0)

  override def deserialize(bytes: Array[Byte]): Intersection = {
    val i = createAggregationBuffer()
    if (bytes.nonEmpty && bytes(0) == 1)
      i.intersect(ThetaSketches.heapifySketch(
        Memory.wrap(java.util.Arrays.copyOfRange(bytes, 1, bytes.length))))
    i
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaIntersectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaIntersectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaIntersectAgg =
    copy(child = newChildren.head)
}

/** Scalar reader: distinct-count estimate from theta sketch bytes.
  * Exact mode (below nominal entries) returns exact integers as
  * doubles. Runs on sketch rows — bounded — so CodegenFallback is free.
  */
case class ThetaEstimateOf(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"

  override protected def nullSafeEval(input: Any): Any =
    ThetaSketches.heapifySketch(
      Memory.wrap(input.asInstanceOf[Array[Byte]])).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimateOf =
    copy(child = newChild)
}

/** Scalar A-NOT-B: sketch bytes of the set difference of two sketch
  * byte columns — churn ("in last batch, not in this one") in one
  * expression over persisted sketches.
  */
case class ThetaAnotBOf(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_a_not_b"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = ThetaSketches.setOperationBuilder().buildANotB()
    op.aNotB(
      ThetaSketches.heapifySketch(Memory.wrap(a.asInstanceOf[Array[Byte]])),
      ThetaSketches.heapifySketch(Memory.wrap(b.asInstanceOf[Array[Byte]])))
      .toByteArray
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaAnotBOf =
    copy(left = newLeft, right = newRight)
}

object ThetaAgg {
  /** Per-group theta sketch bytes of a key column. */
  def sketch(c: Column, lgK: Int = 12): Column =
    Shim.column(new ThetaSketchAgg(Shim.expression(c), lgK).toAggregateExpression())

  /** Union of persisted sketch-bytes rows. */
  def union(c: Column, lgK: Int = 12): Column =
    Shim.column(new ThetaUnionAgg(Shim.expression(c), lgK).toAggregateExpression())

  /** Intersection of persisted sketch-bytes rows. */
  def intersect(c: Column): Column =
    Shim.column(new ThetaIntersectAgg(Shim.expression(c)).toAggregateExpression())

  /** Distinct-count estimate read from sketch bytes. */
  def estimate(c: Column): Column =
    Shim.column(ThetaEstimateOf(Shim.expression(c)))

  /** Sketch bytes of `a` minus `b` (set difference). */
  def aNotB(a: Column, b: Column): Column =
    Shim.column(ThetaAnotBOf(Shim.expression(a), Shim.expression(b)))
}

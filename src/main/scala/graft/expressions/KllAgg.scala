package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** KLL quantile sketches (Apache DataSketches) — the QUANTILES member
  * of the mergeable-sketch family next to the HLL distinct sketches
  * (`Sketches.distinctSketches`) and the frequent-items sketch
  * ([[FreqItemsAgg]]): each task folds its partition into a fixed-size
  * sketch, only sketch bytes cross the wire, and persisted per-batch
  * sketches union into quantiles-over-any-batch-subset without
  * rescanning history. Rank error is the published ~1.65%/k=200
  * single-sided bound; KLL compaction is randomized, so results carry a
  * tolerance contract (SketchSpec), not bit-stability — rows-only by
  * nature, like the heavy hitters.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_sketch"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray()

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray()

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapify returns a read-only compact view for compact images; make
    // a fresh updatable sketch and merge into it so the buffer protocol
    // can keep updating after a shuffle boundary
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Union of persisted KLL sketch bytes — the query-time face over
  * materialized per-batch sketches (the `hll_union_agg` analogue).
  */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_union"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray()

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray()

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllUnionAgg =
    copy(child = newChildren.head)
}

/** Scalar reader: quantiles at the given ranks from KLL sketch bytes
  * (INCLUSIVE search criteria, the DataSketches default). Runs on
  * sketch rows — bounded, never the corpus — so CodegenFallback costs
  * nothing.
  */
case class KllQuantilesOf(child: Expression, ranks: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"ranks must be within [0, 1], got $ranks")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_kll_quantiles"

  override protected def nullSafeEval(input: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new GenericArrayData(
      sk.getQuantiles(ranks.toArray, QuantileSearchCriteria.INCLUSIVE))
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantilesOf =
    copy(child = newChild)
}

object KllAgg {
  /** Per-group sketch bytes of a double column. */
  def sketch(c: Column, k: Int = 200): Column =
    Shim.column(new KllSketchAgg(Shim.expression(c), k).toAggregateExpression())

  /** Union of sketch-bytes rows into one sketch. */
  def union(c: Column, k: Int = 200): Column =
    Shim.column(new KllUnionAgg(Shim.expression(c), k).toAggregateExpression())

  /** Quantile values at `ranks` read from sketch bytes. */
  def quantiles(c: Column, ranks: Seq[Double]): Column =
    Shim.column(KllQuantilesOf(Shim.expression(c), ranks))
}

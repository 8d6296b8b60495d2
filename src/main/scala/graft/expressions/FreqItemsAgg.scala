package graft.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate heavy hitters (DataSketches frequent-items) as a native
  * TypedImperativeAggregate — the global top-k the exact
  * groupBy+count+topk pipeline cannot deliver at 100 TB without
  * shuffling every distinct value: here each task folds its partition
  * into a FIXED-SIZE mergeable sketch, only sketches cross the wire
  * (serialized ONLY at shuffle boundaries, the same buffer protocol as
  * Spark's own percentile_approx), and the guarantee is one-sided —
  * with NO_FALSE_NEGATIVES, every item with true count >
  * streamLength/maxMapSize is present, and each reported estimate
  * brackets the true count in [lb, ub].
  *
  * The sketch result depends on eviction order, so output is stable
  * for a fixed partitioning but not bit-identical across layouts —
  * this is a rows-only operator by nature (SketchSpec asserts the
  * bracket-and-no-false-negative contract instead, which is what a
  * user consumes).
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = FreqItemsAgg.resultType
  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  override def eval(buffer: ItemsSketch[String]): Any = {
    // deterministic rendering: estimate desc, then item — so a fixed
    // partitioning yields a stable result row set
    val rows = buffer.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map { r =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.getItem),
          r.getEstimate, r.getLowerBound, r.getUpperBound))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqItemsAgg.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqItemsAgg.serde)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
}

object FreqItemsAgg {

  private val serde = new ArrayOfStringsSerDe

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  /** Aggregate Column: array of (item, estimate, lb, ub), heaviest
    * first. Every item with true count > n/maxMapSize is guaranteed
    * present; estimates bracket true counts in [lb, ub].
    */
  def apply(c: Column, maxMapSize: Int): Column =
    Shim.column(new FreqItemsAgg(Shim.expression(c), maxMapSize)
      .toAggregateExpression())
}

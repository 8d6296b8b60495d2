package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of (point-in-time) join — the whole-operator Catalyst path
  * from the build brief's preference ladder (custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions`): for each left row, attach the values of
  * the latest right row with `right.time <= left.time` in the same key
  * group (DuckDB/QuestDB ASOF JOIN semantics; ties inclusive).
  *
  * Why a physical operator instead of the union+window composition in
  * [[graft.operators.AsOf]]: the composition shuffles |left|+|right|
  * rows padded to the UNION's combined width and then runs a Window
  * (sort + whole-frame pass) over the union. This node declares
  * `ClusteredDistribution(keys)` + per-key time ordering for each child
  * separately, so EnsureRequirements plans the same exchanges a
  * sort-merge join gets — each side shuffles only its own columns — and
  * the merge itself is a single forward pass holding ONE buffered right
  * row, never a window frame. At 100 TB: two narrow hash exchanges and
  * a streaming zip, state O(1) per partition; AQE coalesces the
  * exchanges exactly as it does for SMJ.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute]) extends BinaryNode {

  // left-outer shape: every left row survives, right values go nullable
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical merge as-of join. Both children arrive clustered on the
  * join keys and sorted by (keys…, time); `doExecute` zips the
  * co-partitioned children and advances a single right-side cursor:
  *
  *   - right rows with key < current left key are discarded (left is
  *     key-ascending, they can never match again);
  *   - right rows with equal key and time <= left time update the
  *     one-row `lastMatch` buffer (arriving time-ascending, the last
  *     writer is the as-of match);
  *   - the cursor stops at the first right row with time > left time,
  *     leaving it for later left rows.
  *
  * Null semantics (SQL equality): null keys never match; a null left
  * time matches nothing; right rows with null time are skipped. Rows
  * with null keys/times are still consumed so the cursor cannot stall.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // same contract as SortMergeJoin: cluster each child on its keys and
  // let EnsureRequirements co-partition them (zipPartitions needs equal
  // partition counts, which compatible ClusteredDistributions guarantee)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTimeA = leftTime
    val rTimeA = rightTime
    val rVals = rightValues
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
        private val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
        private val lTimeProj = UnsafeProjection.create(Seq(lTimeA), lOutput)
        private val rTimeProj = UnsafeProjection.create(Seq(rTimeA), rOutput)
        private val valueProj = UnsafeProjection.create(rVals, rOutput)
        // bind against nullable-widened value attrs: the join is
        // left-outer shaped, so the values slot of the joined row may
        // hold nulls even when the right child's schema says non-null
        private val outProj = UnsafeProjection.create(
          outAttrs, lOutput ++ rVals.map(_.withNullability(true)))
        private val keyOrd =
          RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
        private val timeOrd =
          RowOrdering.createNaturalAscendingOrdering(Seq(lTimeA.dataType))
        private val numKeys = lKeys.length
        private val joined = new JoinedRow
        private val nullValues = new GenericInternalRow(rVals.length)

        // right cursor: the next unconsumed right row (copied — sorter
        // iterators reuse row buffers) and its projected key/time
        private var rHeadKey: UnsafeRow = null
        private var rHeadTime: UnsafeRow = null
        private var rHeadValues: UnsafeRow = null
        // latest right match consumed so far, and the key it belongs to
        private var matchKey: UnsafeRow = null
        private var matchValues: UnsafeRow = null

        advanceRight()

        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            val r = rIter.next()
            rHeadKey = rKeyProj(r).copy()
            rHeadTime = rTimeProj(r).copy()
            rHeadValues = valueProj(r).copy()
          } else {
            rHeadKey = null; rHeadTime = null; rHeadValues = null
          }
        }

        private def anyNullKey(key: UnsafeRow): Boolean = {
          var i = 0
          while (i < numKeys) { if (key.isNullAt(i)) return true; i += 1 }
          false
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          // projection buffers are only clobbered by their OWN next
          // call (next left row) — safe to use un-copied within this row
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          val lTimeNull = lTime.isNullAt(0)
          var c = 0
          while (rHeadKey != null && {
              c = keyOrd.compare(rHeadKey, lKey)
              c < 0 || (c == 0 && (rHeadTime.isNullAt(0) ||
                (!lTimeNull && timeOrd.compare(rHeadTime, lTime) <= 0)))
            }) {
            if (c == 0 && !rHeadTime.isNullAt(0) && !anyNullKey(rHeadKey)) {
              matchKey = rHeadKey
              matchValues = rHeadValues
            }
            advanceRight()
          }
          val values: InternalRow =
            if (matchValues != null && !lTimeNull && !anyNullKey(lKey) &&
                keyOrd.compare(matchKey, lKey) == 0) matchValues
            else nullValues
          numOutputRows += 1
          outProj(joined(l, values))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Restores predicate pushdown through [[AsOfJoin]] — custom logical
  * nodes are optimization barriers (PushDownPredicates only knows the
  * built-in operators), so without this rule a `WHERE` above the join
  * parks on top of it and the scans read everything.
  *
  * Only LEFT-side conjuncts move: each left row's as-of match is
  * independent of every other left row, so pre-filtering the left child
  * is equivalence-preserving. Right-side predicates must NOT push — a
  * filter on an attached value column changes which right row is
  * "latest" (it would re-match instead of null-out), exactly like the
  * preserved side of an outer join.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoin) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(leftOnly.reduce(And), aj.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]. A planner strategy (not an
  * optimizer rule): the node IS the desired physical algorithm, there
  * is nothing to cost.
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, rv) =>
      AsOfJoinExec(lk, rk, lt, rt, rv, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions` entry point — `GraftSession` registers it so
  * every engine session can plan graft logical nodes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => GraftStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
    // the native expressions as SQL functions (graft_rolling_hash, …)
    graft.expressions.SqlFunctions.register(ext)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from existing operators per the preference order in the
  * build brief: for every left row, attach the value of the latest
  * right row with `right.time <= left.time` in the same key group.
  *
  * Shape: tag both sides, UNION, one window pass per key ordered by
  * (time, side) with `last(value, ignoreNulls)` over the running frame,
  * keep left rows. One shuffle on the key, linear in |left|+|right| —
  * no per-key loop, no O(|left|·|right|) range join, no state that
  * outgrows an executor (skewed keys fall back to the same salting
  * guards as any window op).
  *
  * Ties: right rows sort before left rows at equal time, so the match
  * is inclusive (right.time <= left.time) — the same semantics as
  * DuckDB/QuestDB ASOF JOIN, which the oracle exploits.
  */
object AsOf {

  /** @param left      probe side
    * @param right     reference side; must be unique per (keys, timeCol)
    *                  (pre-aggregate otherwise — ambiguous as-of matches
    *                  are nondeterministic in any engine)
    * @param keys      equi-join key columns (present on both sides)
    * @param timeCol   ordering column name (present on both sides)
    * @param valueCols right-side columns to attach to left rows
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("_side", lit(1))
      .select((keys.map(col) :+ col(timeCol) :+ lit(1).as("_side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_v_$c")) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol)
          .map(c => col(c).as(s"_l_$c")): _*)
    val rTagged = right
      .select((keys.map(col) :+ col(timeCol) :+ lit(0).as("_side")) ++
        valueCols.map(c => col(c).as(s"_v_$c")) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = lTagged.unionByName(rTagged)
      .select((keys.map(col) :+ col(timeCol) :+ col("_side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol).map(c => col(s"_l_$c")) ++
        valueCols.map(c => last(col(s"_v_$c"), ignoreNulls = true).over(w).as(c)): _*)
    attached.where(col("_side") === 1)
      .select((keys.map(col) :+ col(timeCol)) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol)
          .map(c => col(s"_l_$c").as(c)) ++
        valueCols.map(col): _*)
  }

  /** Column helper: epoch seconds of a timestamp (both engines agree). */
  def epochSeconds(c: Column): Column = c.cast("long")
}

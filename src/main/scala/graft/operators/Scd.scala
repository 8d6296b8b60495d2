package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) builds over a change/event log —
  * the warehouse-ETL step that turns "user U emitted state S at time T"
  * records into versioned validity intervals
  * (effective_from, effective_to, is_current, version).
  *
  * The reference pipeline materializes only current-state snapshots
  * (e.g. `/root/reference/etl_textreuse/database_assets/` loads the
  * latest mapping tables); SCD2 is the standard production extension
  * when history must stay queryable ("what did the dimension say as of
  * date D"), and it composes with [[graft.operators.AsOf]] — an as-of
  * join against the interval table answers exactly that question.
  *
  * Scale shape: one exchange on the dimension key feeds every window
  * (consecutive-repeat collapse, versioning, interval close) — the
  * sort order is shared, so Spark plans a single shuffle + a single
  * sort for the whole build. Per-key history fits a window partition by
  * construction (a key's change count, not the corpus size).
  */
object Scd {

  /** Build a Type-2 dimension from a change log.
    *
    * @param changes  change records, one row per observation
    * @param keyCols  dimension natural key (e.g. user_id)
    * @param stateCol tracked attribute; CONSECUTIVE repeats of the same
    *                 state for a key collapse into one interval
    *                 (null-safe: null==null collapses too)
    * @param tsCol    observation time (any orderable type)
    * @param tieCol   deterministic tiebreak for equal timestamps
    * @return input key + state columns plus `version` (1-based per
    *         key), `effective_from`, `effective_to` (null = open) and
    *         `is_current`
    */
  def buildType2(changes: DataFrame, keyCols: Seq[String], stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val collapsed = changes
      .select((keyCols ++ Seq(stateCol, tsCol, tieCol)).map(col): _*)
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      .withColumn("_first", row_number().over(w) === 1)
      // null-safe inequality: a null state is a real (collapsible) state
      .where(col("_first") || !(col("_prev") <=> col(stateCol)))
      .drop("_prev", "_first")
    collapsed
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .drop(tsCol)
  }

  /** Incremental SCD2 maintenance — the daily-drop face of
    * [[buildType2]] (family member of `Dedup.exactIncremental` /
    * `Sampling.shuffleToShardsIncremental`): fold a new batch of change
    * records into an existing dimension without touching the histories
    * of unaffected keys.
    *
    * Every interval row IS a change record (its state became effective
    * at effective_from with tiebreak `version`-order preserved via
    * `tieCol` carried in the dim — callers keep `tieCol` in the dim
    * schema), so the affected keys' change logs are recovered from the
    * dimension itself, unioned with the batch, and rebuilt; keys absent
    * from the batch pass through untouched (left_anti). Exact: equals a
    * full rebuild over history ∪ batch for ANY batch timestamps —
    * late-arriving changes splice correctly, they don't just append.
    *
    * Scale shape: the rebuild shuffles only the affected keys' rows
    * (batch-sized, not dimension-sized); the untouched side is one
    * anti-join against the distinct batch keys.
    */
  def applyChanges(dim: DataFrame, batch: DataFrame, keyCols: Seq[String],
      stateCol: String, tsCol: String, tieCol: String): DataFrame = {
    val keyC = keyCols.map(col)
    val batchKeys = batch.select(keyC: _*).distinct()
    val untouched = dim.join(batchKeys, keyCols, "left_anti")
    val recovered = dim.join(batchKeys, keyCols, "left_semi")
      .select((keyCols ++ Seq(stateCol, tieCol)).map(col)
        :+ col("effective_from").as(tsCol): _*)
    val rebuilt = buildType2(
      recovered.unionByName(
        batch.select((keyCols ++ Seq(stateCol, tsCol, tieCol)).map(col): _*)),
      keyCols, stateCol, tsCol, tieCol)
    untouched.unionByName(rebuilt)
  }

  /** Point-in-time lookup: the dimension rows valid at `at` —
    * effective_from <= at < effective_to (open intervals match any
    * later time). The SCD2 read face; map-only over the interval table.
    */
  def asOfSnapshot(dim: DataFrame, at: Column): DataFrame =
    dim.where(col("effective_from") <= at &&
      (col("effective_to").isNull || at < col("effective_to")))
}

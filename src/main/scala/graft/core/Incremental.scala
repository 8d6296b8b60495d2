package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the daily-rollup shape: a
  * persisted per-group aggregate STATE absorbs insert-only delta
  * batches by a state-merge that never rescans history. At 100 TB the
  * difference is structural, not incremental: the full rollup rescans
  * the corpus every day, the state merge touches yesterday's compact
  * state (|groups| rows) plus today's delta.
  *
  * The state carries the MERGEABLE form of each aggregate — (count,
  * fixed-point sum, min, max); avg and other derived metrics are read
  * faces over it. Merge is the same groupBy shape as build (union →
  * partial-agged combine), so state merged in any batch order equals
  * the single-pass aggregate EXACTLY — fixed-point integer sums make
  * that equality bit-true, where double sums would drift with
  * association order. Deletes/updates are out of contract (min/max are
  * not subtractable); retractions route through [[Merge.mergeSnapshot]]
  * classification + a rebuild of affected groups instead.
  */
object Incremental {

  /** Per-group aggregate state of `valueCol` (cents fixed-point):
    * (groupCols..., n_rows, sum_cents, min_cents, max_cents).
    */
  def aggState(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.select(groupCols.map(col) :+
        floor(col(valueCol) * 100.0).cast("long").as("cents"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))

  /** Merge any number of state tables (or one state table carrying
    * several batches' rows) into the combined state — associative and
    * commutative, so ingest order never matters.
    */
  def mergeStates(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))
  }

  /** Read face: the metrics a consumer actually wants, derived from
    * state alone — including the exact fixed-point average
    * (cents·100 div n, i.e. value×10⁴ fixed-point, subtract-remainder
    * exact division).
    */
  def readAggregates(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state.select(groupCols.map(col) ++ Seq(
      col("n_rows"), col("sum_cents"), col("min_cents"), col("max_cents"),
      // `div` (integral divide) keeps the quotient in LONG arithmetic;
      // Column `/` is double division, which past 2^53 numerators would
      // round the exactly-divisible quotient off by one
      expr("(sum_cents * 100 - pmod(sum_cents * 100, n_rows)) div n_rows")
        .as("avg_x10000")): _*)
}

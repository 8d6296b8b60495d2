package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands interval union + pairwise coverage metrics.
  *
  * Re-expresses the reference's `coverages` asset (reference:
  * coverages.py:43-163) Spark-first: window running-max → island ids →
  * two-level aggregation → broadcast join with per-document lengths.
  *
  * Exact semantics preserved from the reference:
  *  - `prev_end + 1 >= start` merges *adjacent* intervals ((1,6)+(7,12)
  *    → one island, reference: coverages.py:81);
  *  - island length = MAX(end) − MIN(start), no +1 (coverages.py:95);
  *  - islands are computed per (trs1_id, trs2_id) pair, once over the
  *    t1 intervals and once over the t2 intervals (two orderings).
  *
  * Scale notes: one shuffle on (trs1_id, trs2_id) feeds both window
  * passes and both aggregations; the lengths side is broadcast (the
  * reference hints BROADCAST at coverages.py:156). Tie determinism: the
  * running-sum island id uses the default RANGE frame, so sort-key peers
  * share an island id regardless of intra-tie order — safe under
  * retries/partition changes.
  */
object Coverages {

  /** Assign island ids to intervals grouped by `keys`, ordered by
    * (start, end). Output = input columns + `islandCol`.
    */
  def withIslandIds(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String, islandCol: String): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val prevEnd = max(col(endCol)).over(part.rowsBetween(Window.unboundedPreceding, -1))
    // default (RANGE) frame for the running sum: peers share the id
    df.withColumn("_new_island",
        when(prevEnd + 1 >= col(startCol), 0).otherwise(1))
      .withColumn(islandCol, sum(col("_new_island")).over(part))
      .drop("_new_island")
  }

  /** Merged-interval (island) stats per key group: island count and
    * total covered length (sum over islands of max(end)−min(start)).
    */
  def islandStats(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String, nCol: String, lenCol: String): DataFrame = {
    val withIds = withIslandIds(df, keys, startCol, endCol, "_island_id")
    withIds
      .groupBy((keys :+ "_island_id").map(col): _*)
      .agg((max(col(endCol)) - min(col(startCol))).cast("long").as("_island_len"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(nCol), sum(col("_island_len")).as(lenCol))
  }

  /** Full pairwise coverage table (SURVEY.md §1.4 `coverages`).
    *
    * @param textreuses columns (trs1_id, trs2_id, trs1_start, trs1_end,
    *                   trs2_start, trs2_end) — one row per hit
    * @param lengths    columns (trs_id, text_length)
    */
  def coverages(textreuses: DataFrame, lengths: DataFrame): DataFrame = {
    val keys = Seq("trs1_id", "trs2_id")
    val t1 = islandStats(
      textreuses.select("trs1_id", "trs2_id", "trs1_start", "trs1_end"),
      keys, "trs1_start", "trs1_end", "t1_reuses", "reuse_t1_t2")
    val t2 = islandStats(
      textreuses.select("trs1_id", "trs2_id", "trs2_start", "trs2_end"),
      keys, "trs2_start", "trs2_end", "t2_reuses", "reuse_t2_t1")
    val len1 = lengths.select(col("trs_id").as("trs1_id"), col("text_length").as("t1_length"))
    val len2 = lengths.select(col("trs_id").as("trs2_id"), col("text_length").as("t2_length"))
    // lengths joins are LEFT (reference: coverages.py:158-160 LEFT JOINs
    // textreuse_source_lengths): a trs missing a length row yields null
    // coverage rather than silently dropping the pair
    t1.join(t2, keys)
      .join(broadcast(len1), Seq("trs1_id"), "left")
      .join(broadcast(len2), Seq("trs2_id"), "left")
      .select(col("trs1_id"), col("trs2_id"),
        col("t1_reuses"), col("t2_reuses"),
        col("reuse_t1_t2"), col("reuse_t2_t1"),
        (col("reuse_t1_t2") / col("t1_length") * lit(100.0)).as("coverage_t1_t2"),
        (col("reuse_t2_t1") / col("t2_length") * lit(100.0)).as("coverage_t2_t1"))
  }
}

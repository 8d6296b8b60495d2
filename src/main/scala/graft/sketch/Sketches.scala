package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate statistics — the scale path where the exact
  * operators' cost model breaks down. The exact twins stay the
  * oracle-checked faces (`q_agg_distinct_count`, `q_text_quantiles`);
  * these are the forms a 100 TB profile job actually runs:
  *
  *  - exact COUNT(DISTINCT) shuffles every distinct value;
  *    `approx_count_distinct` (HyperLogLog++) shuffles one fixed-size
  *    sketch per partition — mergeable, single narrow aggregation.
  *  - exact percentiles sort each group;
  *    `approx_percentile` (t-digest) partial-aggregates bounded-size
  *    digests.
  *
  * Approximate results are engine-specific (sketch internals differ),
  * so there is no DuckDB oracle — SketchSpec instead asserts the
  * documented ERROR BOUNDS against the exact answers, which is the
  * contract a user consumes.
  */
object Sketches {

  /** HyperLogLog++ distinct counts for each of `cols`, one pass.
    * `rsd` is the target relative standard deviation (Spark default
    * 0.05); sketch size grows as 1/rsd² — 0.01 costs ~27 KB/group.
    */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"${cols.head}_approx"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"${c}_approx")): _*)
  }

  /** Approximate global heavy hitters over `itemCol` — one row per
    * frequent item, heaviest first, with the [lb, ub] bracket on the
    * true count. Backed by the native frequent-items aggregate
    * (graft.expressions.FreqItemsAgg): fixed-size mergeable sketches,
    * no per-value shuffle. Guarantee: every item with true count >
    * n/maxMapSize is present (no false negatives).
    */
  def topItems(df: DataFrame, itemCol: String, maxMapSize: Int = 1024): DataFrame =
    df.agg(graft.expressions.FreqItemsAgg(col(itemCol), maxMapSize).as("items"))
      .select(explode(col("items")).as("f"))
      .select(col("f.item"), col("f.estimate"), col("f.lb"), col("f.ub"))

  /** Per-group t-digest percentiles of `valueCol` at `percentiles`.
    * `accuracy` trades memory for error: err ≈ 1/accuracy of the RANK
    * (not the value) — 10000 gives ~0.01 quantile-rank error.
    */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      percentiles: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(percentiles.nonEmpty, "need at least one percentile")
    val pArr: Column = array(percentiles.map(lit): _*)
    df.groupBy(col(groupCol))
      .agg(approx_percentile(col(valueCol), pArr, lit(accuracy)).as("quantiles"),
        count(lit(1)).as("n_rows"))
  }

  /** Per-group HLL sketch BYTES (Apache DataSketches, Spark's native
    * hll_sketch_agg) — the PERSISTABLE form of a distinct count. This
    * is the incremental-analytics face the one-shot
    * [[approxDistinct]] cannot provide: materialize one sketch row per
    * (group, batch), and any later union answers "distinct over any
    * subset of batches" without rescanning a byte of history.
    * `lgK` trades size for error (2^lgK registers; 12 ≈ ±1.6% rsd).
    */
  def distinctSketches(df: DataFrame, groupCol: String, valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Union persisted sketches per group and read the estimate — the
    * query-time face over [[distinctSketches]] output. HLL union is a
    * per-register max: commutative, associative, order-independent —
    * so the union of per-batch sketches is BIT-IDENTICAL to a
    * single-pass sketch of the union (SketchSpec asserts exact
    * estimate equality, not a tolerance).
    */
  def unionDistinctEstimate(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(hll_union_agg(col("sketch")).as("merged"),
        sum(col("n_rows")).as("n_rows"))
      .select(col(groupCol),
        hll_sketch_estimate(col("merged")).as("distinct_est"),
        col("n_rows"))

  /** Per-(group) KLL quantile sketch BYTES — the QUANTILES member of
    * the persisted-sketch family ([[distinctSketches]] is distincts,
    * `FreqItemsAgg` frequencies): materialize one sketch row per
    * (group, batch); any later union answers "quantiles over any batch
    * subset" without rescanning history. k=200 ≈ 1.65% single-sided
    * rank error; KLL compaction is randomized, so the contract is a
    * rank-error tolerance (SketchSpec), not bit-stability.
    */
  def quantileSketches(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 200): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.expressions.KllAgg.sketch(col(valueCol).cast("double"), k)
          .as("sketch"),
        count(col(valueCol)).as("n_rows"))

  /** Union persisted quantile sketches per group and read quantiles at
    * `ranks` — the query-time face over [[quantileSketches]] output.
    */
  def unionQuantileEstimate(sketches: DataFrame, groupCol: String,
      ranks: Seq[Double], k: Int = 200): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(graft.expressions.KllAgg.union(col("sketch"), k).as("merged"),
        sum(col("n_rows")).as("n_rows"))
      .select(col(groupCol),
        graft.expressions.KllAgg.quantiles(col("merged"), ranks).as("quantiles"),
        col("n_rows"))
}

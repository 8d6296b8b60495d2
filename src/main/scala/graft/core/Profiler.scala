package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the first job run against any new corpus
  * drop: row count, per-column null count, exact distinct count, and
  * min/max. Every statistic computes in a SINGLE aggregate over ONE
  * scan (profiling at 100 TB is scan-bound — never one job per
  * column), then pivots to long form with a literal struct-explode, no
  * second scan.
  *
  * min/max evaluate in the column's native type and are string-rendered
  * afterwards, so the output schema is type-independent without
  * changing ordering semantics. Exact distincts make Catalyst Expand
  * the input once per counted column (the standard multi-distinct
  * plan); for a quick look at a very wide table use
  * `graft.sketch.Sketches.approxDistinct` instead — one exchange total.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"))
    }
    wide.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** Equi-width histogram of an integral column — the distribution
    * companion to [[profile]]'s min/max. Bin edges derive from the
    * observed [lo, hi] range; every row maps to
    * bin = ((v − lo) · bins) div (hi − lo + 1), which lands in
    * [0, bins−1] by construction (no clamp needed) and is EXACT: the
    * division uses the subtract-remainder form, all in long arithmetic,
    * so the DuckDB twin reproduces bins bit-for-bit — equi-width is the
    * scale-safe histogram (equi-DEPTH needs a global rank; for that use
    * the quantile operator).
    *
    * Scale shape: one 1-row bounded min/max aggregate attaches by
    * broadcast (the designed BNLJ shape), then a map-only bin
    * expression and one partial-aggregated groupBy on ≤`bins` keys.
    * Nulls are excluded (a null has no position in the range).
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val v = col(valueCol).cast("long")
    val bounds = df.where(v.isNotNull)
      .agg(min(v).as("_lo"), max(v).as("_hi"))
    val x = (v - col("_lo")) * bins
    val d = col("_hi") - col("_lo") + lit(1L)
    df.where(v.isNotNull)
      .join(broadcast(bounds))
      .withColumn("bin", ((x - pmod(x, d)) / d).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"), min(v).as("min_v"), max(v).as("max_v"))
  }
}

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
}

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

  /** Robust per-group statistics — the outlier-proof face of the
    * moment profiler (mean/stddev move with a single corrupted row;
    * median/MAD don't, which is why corpus length/quality monitoring
    * wants these): doubled exact median (2·median of an integer column
    * is an integer — the ×2 keeps the even-count midpoint exact where
    * a half would need a double), doubled MAD on the same trick, and
    * the 10-90% trimmed mean in fixed-point ×100.
    *
    * Scale shape: two aggregation passes over the value column (the
    * MAD is a median OF deviations FROM the median — inherently two
    * dependent passes), each a sort-based exact percentile per group;
    * group medians attach back by broadcast (|groups| rows). Exact
    * medians sort within groups — that is the operator's contract; the
    * sketch family (`Sketches.approxQuantiles`/KLL) is the scale path
    * when rank error is acceptable.
    */
  def robustStats(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("long")
    val rows = df.where(v.isNotNull).select(col(groupCol), v.as("v"))

    // doubled median of `c` by TWO ORDER STATISTICS: ranks (n+1)/2 and
    // n/2+1 (1-based) — for odd n both hit the middle row (summing it
    // twice), for even n the two middle rows; their sum is exactly
    // 2·median, all integer. Ties order arbitrarily under row_number,
    // but tied rows carry equal values, so the sum is order-free.
    def med2(in: DataFrame, c: String): DataFrame = {
      val w = Window.partitionBy(groupCol).orderBy(col(c))
      in.withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCol)))
        .groupBy(groupCol)
        // Spark's `/` on longs is a DOUBLE divide; the cast truncates
        // back to the floor rank (3.5 → 3), which is exactly the
        // lower/upper-middle pair for both parities
        .agg((sum(when(col("_rn") === ((col("_n") + 1) / 2).cast("long"), col(c))) +
          sum(when(col("_rn") === (col("_n") / 2).cast("long") + 1, col(c))))
          .as("med2"),
          max(col("_n")).as("n_rows"))
    }

    val m = med2(rows, "v")
    val dev = rows.join(broadcast(m.select(col(groupCol), col("med2"))), Seq(groupCol))
      .withColumn("dev2", abs(col("v") * 2L - col("med2")))
    // median of doubled deviations, doubled again: mad4 = 4·MAD exact
    val mad = med2(dev.select(col(groupCol), col("dev2")), "dev2")
      .select(col(groupCol), col("med2").as("mad4"))

    // 10-90% trimmed mean: drop floor(n/10) rows from EACH end by rank
    // (pure integer cuts; a cut inside a tie run is value-neutral),
    // fixed-point ×100 subtract-remainder division
    val w = Window.partitionBy(groupCol).orderBy(col("v"))
    val trimmed = rows.withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .withColumn("_cut", expr("_n div 10"))
      .where(col("_rn") > col("_cut") && col("_rn") <= col("_n") - col("_cut"))
      .groupBy(groupCol)
      .agg(sum(col("v")).as("_s"), count(lit(1)).as("_k"))
      // `div` keeps the exactly-divisible quotient in LONG arithmetic
      // (double `/` would round it off by one past 2^53 numerators)
      .select(col(groupCol),
        expr("(_s * 100 - pmod(_s * 100, _k)) div _k").as("trimmed_mean_x100"))

    m.join(mad, Seq(groupCol)).join(trimmed, Seq(groupCol))
      .select(col(groupCol), col("n_rows"), col("med2"), col("mad4"),
        col("trimmed_mean_x100"))
  }
}

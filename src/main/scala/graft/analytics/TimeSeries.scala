package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equally-spaced time-series statistics over an integer series
  * (t, x) — autocorrelation (the seasonality/burstiness detector: "does
  * this hour predict the next") and an exponential moving sum (the
  * denoised trend line) — the monitoring primitives over per-bucket
  * event counts that the drift/CUSUM family assumes but never computed.
  *
  * Both are built on the same scale-honest shape: the per-row lag/tap
  * fan-out is a map-side `explode(sequence(...))` (bounded by the lag
  * count — NO crossJoin, NO window over the whole series), followed by
  * one equi-join on the shifted timestamp and one partial-agged groupBy.
  * Cost is |series|·maxLag rows of (long, long) — linear, shuffle-once.
  *
  * Exactness: sufficient statistics accumulate in DECIMAL(38,0) (the
  * correlationMatrix convention) with the same 32-bit product guard;
  * the one final double expression (cov/√vi/√vj) is identical in both
  * engines — every input sum is an exact integer below 2^53, and IEEE
  * mul/div/sqrt are correctly rounded, so the floored ×1e6 fixed-point
  * result is bit-equal, not approximately equal.
  *
  * Missing buckets are absent rows, and the contract is "observed
  * buckets only": a lag pair whose partner bucket is missing drops out
  * of that lag's statistics, and an absent tap contributes 0 to the
  * moving sum — which for COUNT series is the numerically correct
  * zero-count contribution, not an approximation.
  */
object TimeSeries {

  private val bound = Int.MaxValue.toLong

  private def guarded(c: String): Column = {
    val x = col(c).cast("long")
    when(abs(x) <= bound, x).otherwise(raise_error(concat(
      lit(s"TimeSeries: |$c| = "), abs(x).cast("string"),
      lit(s" exceeds the 32-bit product headroom ($bound) — rescale the series"))))
  }

  /** Autocorrelation of the series at lags 1..maxLag: for each lag k,
    * Pearson correlation of (x_t, x_{t+k·step}) over every observed
    * pair, emitted floor-scaled ×1e6 (null when either side is
    * constant — the correlationMatrix contract).
    *
    * @param series (t, x): t long bucket timestamps on a step grid
    * @param step   grid spacing of t (e.g. 3600 for hourly buckets)
    * @return (lag, n_rows, corr_s), one row per lag
    */
  def autocorrelation(series: DataFrame, step: Long, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val s = series.select(col("t").cast("long").as("t"), guarded("x").as("x"))
    pearsonByLag(s.select(col("t"), col("x").as("xa")),
      s.select(col("t"), col("x").as("xb")), step, 1, maxLag)
  }

  /** Shared lag-fan-out + shifted-equi-join + per-lag Pearson core of
    * the two correlation faces: `a` carries (t, xa), `b` (t, xb).
    */
  private def pearsonByLag(a: DataFrame, b: DataFrame, step: Long,
      loLag: Int, hiLag: Int): DataFrame = {
    val fan = a.select(col("t"), col("xa"),
        explode(expr(s"sequence($loLag, $hiLag)")).as("lag0"))
      .select(col("t"), col("xa"), col("lag0").cast("long").as("lag"))
    val joined = fan.join(b.select(col("t").as("tb"), col("xb")),
      col("tb") === col("t") + col("lag") * lit(step))
    val st = joined.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("xa").cast("decimal(38,0)")).as("sa"),
        sum(col("xb").cast("decimal(38,0)")).as("sb"),
        sum((col("xa") * col("xa")).cast("decimal(38,0)")).as("paa"),
        sum((col("xa") * col("xb")).cast("decimal(38,0)")).as("pab"),
        sum((col("xb") * col("xb")).cast("decimal(38,0)")).as("pbb"))
    val n = col("n_rows").cast("double")
    def d(c: String) = col(c).cast("double")
    val cov = n * d("pab") - d("sa") * d("sb")
    val vi = n * d("paa") - d("sa") * d("sa")
    val vj = n * d("pbb") - d("sb") * d("sb")
    st.select(col("lag"), col("n_rows"),
      when(vi > 0.0 && vj > 0.0,
        floor(cov / sqrt(vi) / sqrt(vj) * 1000000.0).cast("long"))
        .otherwise(lit(null).cast("long")).as("corr_s"))
  }

  /** Cross-correlation of TWO series at lags −maxLag..maxLag: for each
    * lag k, Pearson correlation of (x_t, y_{t+k·step}) — positive-lag
    * peaks mean the `a` series LEADS `b` (the causality probe: do views
    * this hour predict purchases next hour). Same fan-out/join/stats
    * shape and exactness contract as [[autocorrelation]]; lag 0 is the
    * plain contemporaneous correlation.
    *
    * @param a (t, x)  @param b (t, y) — both on the same step grid
    * @return (lag, n_rows, corr_s), one row per lag with ≥1 pair
    */
  def crossCorrelation(a: DataFrame, b: DataFrame, step: Long,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    pearsonByLag(
      a.select(col("t").cast("long").as("t"), guarded("x").as("xa")),
      b.select(col("t").cast("long").as("t"), guarded("y").as("xb")),
      step, -maxLag, maxLag)
  }

  /** Exponential moving sum with half-per-step decay over a bounded
    * window: for each observed bucket t,
    *   ewma_x2 = Σ_{j=0..taps-1} x_{t−j·step} · 2^(taps−1−j)
    * — the α = 1/2 exponential filter scaled by 2^taps (exact long
    * arithmetic; the infinite tail beyond `taps` steps carries weight
    * < 1 at this scale, which is why the window truncation is exact,
    * not an approximation). Callers read the trend as
    * ewma_x2 / 2^taps.
    *
    * @param series (t, x) as in [[autocorrelation]]
    * @return (t, ewma_x2) for every observed bucket
    */
  def exponentialMovingSum(series: DataFrame, step: Long, taps: Int = 30): DataFrame = {
    require(taps >= 1 && taps <= 62, s"taps must be in [1, 62], got $taps")
    // headroom: taps · max|x| · 2^(taps-1) must stay below 2^63
    val xBound = Long.MaxValue / (1L << (taps - 1)) / taps
    val s = series.select(col("t").cast("long").as("t"),
      when(abs(col("x").cast("long")) <= xBound, col("x").cast("long"))
        .otherwise(raise_error(concat(lit(s"exponentialMovingSum: |x| exceeds "),
          lit(xBound.toString), lit(s" — the $taps-tap weighted sum would overflow"))))
        .as("x"))
    val weights = array((0 until taps).map(j =>
      struct(lit(j.toLong).as("off"), lit(1L << (taps - 1 - j)).as("w"))): _*)
    val targets = s.select(col("t"), explode(weights).as("o"))
      .select(col("t"), col("o.off").as("off"), col("o.w").as("w"))
    targets.join(s.select(col("t").as("tb"), col("x").as("xb")),
        col("tb") === col("t") - col("off") * lit(step))
      .groupBy(col("t"))
      .agg(sum(col("xb") * col("w")).as("ewma_x2"))
  }
}

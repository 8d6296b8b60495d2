package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend fitting with EXACT rational
  * arithmetic — the "is this metric drifting" primitive (per-source
  * document-length drift, per-type event-value trend) computed without
  * any engine-divergent floating point: the slope of y over x is
  *
  *   b = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *
  * and both numerator and denominator are exact integer sums, reported
  * AS integers (the double `slope` is derived by one long/long→double
  * division, identical in any IEEE engine). Zero x-variance (a group
  * observed at a single x) reports null slope, not a division crash.
  *
  * Contract: x and y must be INTEGRAL columns pre-scaled by the caller
  * (epoch days, fixed-point cents) — that is what keeps the sums exact;
  * overflow headroom is the caller's scale choice (|x| ≤ 10^5 and
  * |y| ≤ 10^9 over 10^9 rows stays under 2^63 for every term).
  *
  * Scale shape: ONE partial-aggregated groupBy carrying five integer
  * sums — the textbook map-side-combine aggregation; nothing else
  * moves.
  */
object Regression {

  def fitLineExact(df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("sum_x"), sum(y).as("sum_y"),
        sum(x * y).as("sum_xy"), sum(x * x).as("sum_x2"))
    val num = col("n") * col("sum_xy") - col("sum_x") * col("sum_y")
    val den = col("n") * col("sum_x2") - col("sum_x") * col("sum_x")
    agged
      .withColumn("slope_num", num)
      .withColumn("slope_den", den)
      .withColumn("slope",
        when(col("slope_den") === 0L, lit(null).cast("double"))
          .otherwise(col("slope_num").cast("double") /
            col("slope_den").cast("double")))
  }
}

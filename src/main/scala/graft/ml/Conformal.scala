package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal calibration — the distribution-free way to turn a
  * classifier score into a keep-threshold with a COVERAGE GUARANTEE:
  * given a held-out calibration set of true-positive nonconformity
  * scores, the ⌈(n+1)(1−α)⌉-th smallest score is a threshold under
  * which fresh exchangeable positives fall with probability ≥ 1−α.
  * For corpus curation this is "set the quality-filter cut so at most
  * an α fraction of genuinely-good documents is dropped" — a guarantee
  * the raw sigmoid score (see the calibration face) cannot give.
  *
  * Everything is integer order statistics on the fixed-point scores:
  * the rank index ⌈(n+1)(1−α)⌉ computes as
  * ((n+1)(1e6−α_ppm) + 1e6−1) div 1e6, the threshold is the value at
  * that rank (duplicate scores make the rank's VALUE tie-order-
  * independent), and the empirical coverage on an eval slice is an
  * exact ppm ratio. When the index exceeds n (α too small for the
  * calibration size) the threshold is the conformal +∞ — emitted as
  * NULL with full coverage, never a silently-clamped finite cut.
  *
  * Scale shape: the calibration set is bounded by construction (it is
  * labeled data), so its global-order window is a designed single
  * partition — the ONE place a global sort is correct; the eval side
  * joins the |α|-row threshold table by broadcast and partial-
  * aggregates. Corpus-sized data only ever sees the map-side of that
  * broadcast.
  */
object Conformal {

  /** @param cal   calibration nonconformity scores `(vec_id, q_s)` —
    *              true positives only, q_s long (lower = more normal)
    * @param eval  held-out positives `(vec_id, q_s)` to measure
    *              empirical coverage on
    * @param alphasPpm miscoverage targets in ppm (e.g. 100000 = 10%)
    * @return (alpha_ppm, n_cal, thr_s, n_eval, n_covered, coverage_ppm)
    */
  def thresholds(cal: DataFrame, eval: DataFrame,
      alphasPpm: Seq[Long]): DataFrame = {
    require(alphasPpm.nonEmpty && alphasPpm.forall(a => a > 0 && a < 1000000L),
      "alphas must be in (0, 1e6) ppm")
    require(alphasPpm.distinct.size == alphasPpm.size,
      "alphas must be distinct (alpha_ppm is the output key)")
    val n = cal.agg(count(lit(1)).as("n_cal"))
    val ranked = cal.select(col("q_s"),
      row_number().over(Window.orderBy(col("q_s"), col("vec_id"))).as("rn"))
    val spark = cal.sparkSession
    import scala.jdk.CollectionConverters._
    val alphas = spark.createDataFrame(
      alphasPpm.map(a => org.apache.spark.sql.Row(a)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("alpha_ppm",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val thr = alphas.crossJoin(broadcast(n))
      .withColumn("idx",
        expr("((n_cal + 1) * (1000000 - alpha_ppm) + 999999) div 1000000"))
      .join(ranked, col("rn") === col("idx"), "left")
      .select(col("alpha_ppm"), col("n_cal"), col("q_s").as("thr_s"))
    // the eval aggregate LEFT-joins back onto the threshold table (on
    // the alpha key alone — thr_s may legitimately be null): an empty
    // eval slice must still emit every calibrated threshold, with
    // n_eval = 0 and null coverage, not silently drop them (ADVICE r9)
    val evalAgg = eval.crossJoin(broadcast(thr.select("alpha_ppm", "thr_s")))
      .groupBy("alpha_ppm")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("thr_s").isNull || col("q_s") <= col("thr_s"), 1L)
          .otherwise(0L)).as("n_covered"))
    thr.join(evalAgg, Seq("alpha_ppm"), "left")
      .select(col("alpha_ppm"), col("n_cal"), col("thr_s"),
        coalesce(col("n_eval"), lit(0L)).as("n_eval"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        expr("""CASE WHEN coalesce(n_eval, 0L) > 0
                THEN (n_covered * 1000000L) div n_eval END""").as("coverage_ppm"))
  }
}

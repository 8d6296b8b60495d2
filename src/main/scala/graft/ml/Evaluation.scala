package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators over a scored corpus `(labelCol ∈ {0,1},
  * scoreCol: fixed-point BIGINT)` — the measure step between
  * [[Training]] (fit the quality head) and applying it as a corpus
  * filter: exact ROC-AUC and the operating-point sweep that picks the
  * filter threshold.
  *
  * Both operators reduce the corpus FIRST to the per-score aggregate
  * `(score, n, n_pos)` — one partial-aggregated groupBy whose output
  * cardinality is bounded by the fixed-point score GRID (≤ 1e6+1 rows
  * for [[Training]]'s 1e-6-scale probabilities), not by the corpus.
  * Everything downstream (the rank window, the threshold fan-out)
  * works on that bounded table, so corpus size only ever touches the
  * first aggregation.
  *
  * Determinism: AUC is the Mann-Whitney U statistic with average-rank
  * tie correction, kept in 2-scaled integer arithmetic (`auc_num_x2` /
  * `auc_den_x2`) so the statistic is exact; the reported double is one
  * long/long division, identical in any IEEE engine.
  */
object Evaluation {

  private val S = 1000000L

  /** Exact tie-corrected ROC-AUC: returns one row
    * `(n_pos, n_neg, auc_num_x2, auc_den_x2, auc)` where
    * auc = (Σ_pos avgRank − n_pos(n_pos+1)/2) / (n_pos·n_neg),
    * carried 2-scaled so tied ranks (.5 averages) stay integer.
    * Single-class corpora report null auc, not a division crash.
    */
  def aucExact(scored: DataFrame, labelCol: String, scoreCol: String): DataFrame =
    aucExactBy(scored, labelCol, scoreCol, Nil)

  /** Per-slice exact AUC — [[aucExact]] partitioned by `groupCols`
    * (empty ⇒ one global row): the fairness/robustness eval ("does the
    * head rank as well on every source/language slice as on the
    * corpus"). The rank window partitions by the slice, so each
    * slice's grid sorts independently — still grid-bounded per slice,
    * and no longer a single global task when slices exist.
    */
  def aucExactBy(scored: DataFrame, labelCol: String, scoreCol: String,
      groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val per = scored.groupBy(g :+ col(scoreCol).as("s"): _*)
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("n_pos"))
    // strictly-smaller-score count: a running window over the
    // grid-bounded per-score table — bounded per slice, not a corpus
    // sort (global slice ⇒ one bounded task, the round-4 contract)
    val w = (if (groupCols.isEmpty) Window.orderBy("s")
      else Window.partitionBy(g: _*).orderBy("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = per.withColumn("cum_less", coalesce(sum(col("n")).over(w), lit(0L)))
    // 2-scaled average rank of a tied block: r2 = 2·cum_less + n + 1
    ranked
      .select(g ++ Seq(
        (col("n_pos") * (lit(2L) * col("cum_less") + col("n") + lit(1L)))
          .as("pos_r2"),
        col("n_pos"), (col("n") - col("n_pos")).as("neg")): _*)
      .groupBy(g: _*)
      .agg(sum("pos_r2").as("sum_pos_r2"), sum("n_pos").as("n_pos"),
        sum("neg").as("n_neg"))
      .select(g ++ Seq(col("n_pos"), col("n_neg"),
        (col("sum_pos_r2") - col("n_pos") * (col("n_pos") + lit(1L)))
          .as("auc_num_x2"),
        (lit(2L) * col("n_pos") * col("n_neg")).as("auc_den_x2")): _*)
      .withColumn("auc",
        when(col("auc_den_x2") === 0L, lit(null).cast("double"))
          .otherwise(col("auc_num_x2").cast("double") /
            col("auc_den_x2").cast("double")))
  }

  /** Operating-point sweep: per threshold t (score ≥ t ⇒ predicted
    * positive), the confusion counts plus fixed-point precision /
    * recall — `(thr_s, tp, fp, fn, tn, precision_s, recall_s)`.
    * The literal threshold list fans out by explode over the bounded
    * per-score table (map-side, |grid|·|thresholds| rows partial-agged
    * to |thresholds| groups) — no join, no second corpus scan.
    * An empty predicted-positive set reports null precision.
    */
  def thresholdSweep(scored: DataFrame, labelCol: String, scoreCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val fan = perScore(scored, labelCol, scoreCol)
      .select(col("s"), col("n"), col("n_pos"),
        explode(array(thresholds.map(lit): _*)).as("thr_s"))
    val pos = col("s") >= col("thr_s")
    fan.groupBy("thr_s")
      .agg(sum(when(pos, col("n_pos")).otherwise(0L)).as("tp"),
        sum(when(pos, col("n") - col("n_pos")).otherwise(0L)).as("fp"),
        sum(when(!pos, col("n_pos")).otherwise(0L)).as("fn"),
        sum(when(!pos, col("n") - col("n_pos")).otherwise(0L)).as("tn"))
      .withColumn("precision_s", ratioS(col("tp"), col("tp") + col("fp")))
      .withColumn("recall_s", ratioS(col("tp"), col("tp") + col("fn")))
  }

  /** Calibration / reliability bins: bucket the fixed-point scores into
    * `bins` equal-width bins over [0, 1e6] and report per bin
    * `(bin, n_rows, n_pos, sum_score_s)` — the reliability-diagram
    * table (predicted-vs-observed positive rate per bin) that decides
    * whether the head's probabilities are trustworthy as WEIGHTS (e.g.
    * for soft-filtering or mixture reweighting) rather than only as a
    * threshold. The exact 1e6 score lands in the top bin (least-clamp),
    * the standard closed-top-bin convention. All outputs are exact
    * integers — observed rate n_pos/n and mean score sum/n are left to
    * the reader so the face hash-matches any engine.
    *
    * Same scale shape as [[aucExact]]: one partial-aggregated groupBy
    * whose output cardinality is `bins`, not the corpus.
    */
  def calibrationBins(scored: DataFrame, labelCol: String, scoreCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val width = S / bins
    scored
      .groupBy(least(Training.floorDivP(col(scoreCol), lit(width)),
        lit(bins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        sum(col(scoreCol)).as("sum_score_s"))
  }

  /** The shared corpus reduction: (score, n, n_pos). */
  private def perScore(scored: DataFrame, labelCol: String,
      scoreCol: String): DataFrame =
    scored.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("n_pos"))

  /** Fixed-point num/den ratio at 1e-6 scale; null on a zero
    * denominator. Operands are non-negative, so truncating integral
    * division IS floor division — exact and portable.
    */
  private def ratioS(num: Column, den: Column): Column =
    when(den === 0L, lit(null).cast("long"))
      .otherwise(Training.floorDivP(num * lit(S), den))
}

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

  /** Expected calibration error — the one-number summary of the
    * [[calibrationBins]] reliability diagram:
    *   ECE = Σ_b (n_b/N)·|acc_b − conf_b|,
    * computed WITHOUT any per-bin division: acc_b·n_b = n_pos_b and
    * conf_b·n_b = sum_score_s/1e6 exactly, so the per-bin term is
    * |n_pos_b·1e6 − Σscore_s| in integer 1e-6·rows units and the one
    * floor division by N happens at the end. The number a soft-filter
    * consumer reads before trusting scores as probabilities (the
    * per-bin face shows WHERE it's off; this is HOW MUCH overall).
    *
    * @return one row (n_bins_nonempty, n_rows, ece_s)
    */
  def expectedCalibrationError(scored: DataFrame, labelCol: String,
      scoreCol: String, bins: Int = 10): DataFrame =
    calibrationBins(scored, labelCol, scoreCol, bins)
      .agg(count(lit(1)).as("n_bins_nonempty"),
        sum(col("n_rows")).as("n_rows"),
        sum(abs(col("n_pos") * lit(S) - col("sum_score_s"))).as("sa"))
      .select(col("n_bins_nonempty"), col("n_rows"),
        expr("sa div n_rows").as("ece_s"))

  /** The shared corpus reduction: (score, n, n_pos). */
  /** Cohen's kappa — chance-corrected agreement between two categorical
    * labellings of the same rows (annotator vs annotator, heuristic
    * classifier vs gold labels, two model versions): how much better
    * than coincidence do they agree. With observed agreement
    * p_o = Σ_k n_kk / N and chance agreement p_e = Σ_k r_k·c_k / N²
    * (r/c the marginal counts),
    *   κ = (p_o − p_e) / (1 − p_e)
    *     = (N·Σn_kk − Σ r_k·c_k) / (N² − Σ r_k·c_k)
    * — all integer until one fixed-point floor division ([[Training]]'s
    * pmod-subtract: κ is legitimately negative for worse-than-chance
    * raters, where truncating div would disagree with the SQL twin's
    * floor). Both-constant raters (N² = Σ r·c) report null, not a
    * crash. Rows where either label is null are excluded (no vote).
    *
    * Scale shape: ONE partial-aggregated groupBy on the label pair —
    * categories² rows on the wire regardless of corpus size — then
    * everything (margins, agreement, the final row) runs on that
    * localCheckpoint-ed aggregate.
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String,
      scale: Long = 1000000L): DataFrame = {
    require(aCol != bCol, s"need two distinct label columns, got $aCol twice")
    require(scale > 0, s"scale must be positive, got $scale")
    val pc = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val totals = pc.groupBy().agg(sum(col("n")).as("n_rows"),
      sum(when(col("a") === col("b"), col("n")).otherwise(0L)).as("n_agree"))
    val chance = pc.groupBy(col("a")).agg(sum(col("n")).as("r"))
      .join(pc.groupBy(col("b")).agg(sum(col("n")).as("c")),
        col("a") === col("b"))
      .groupBy().agg(sum(col("r") * col("c")).as("rc"))
    totals.crossJoin(broadcast(chance))
      .select(col("n_rows"), col("n_agree"),
        when(col("n_rows") * col("n_rows") === col("rc"), lit(null))
          .otherwise(Training.floorDivP(
            (col("n_rows") * col("n_agree") - col("rc")) * scale,
            col("n_rows") * col("n_rows") - col("rc"))).as("kappa_s"))
  }

  private def perScore(scored: DataFrame, labelCol: String,
      scoreCol: String): DataFrame =
    scored.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("n_pos"))

  /** Confident-learning-style label-noise audit (Northcutt's CL, the
    * binary single-score special case): per given class j, the class
    * threshold t_j is the floor-mean model score of examples CARRYING
    * label j; an example is suspected mislabeled when its score clears
    * the OTHER class's threshold —
    *   y = 0 suspected when p_s ≥ t₁ (scores like a typical positive),
    *   y = 1 suspected when p_s ≤ t₀ (scores like a typical negative).
    * The counts are the off-diagonal of CL's confident joint — the
    * "how dirty are my labels" number that decides whether a relabel
    * pass is worth buying before the next fit.
    *
    * All integer: floor-mean thresholds via the pmod-subtract ladder
    * (scores are non-negative, but the ladder is the house idiom),
    * comparisons and counts exact. The two 1-row thresholds attach by
    * broadcast; one scan + one 4-key groupBy.
    *
    * @param scored (yCol ∈ {0,1}, scoreCol long fixed-point)
    * @return (y, suspected, n_rows, thr_pos_s, thr_neg_s)
    */
  def labelNoiseCounts(scored: DataFrame, yCol: String,
      scoreCol: String): DataFrame = {
    val y = col(yCol).cast("long")
    val p = col(scoreCol).cast("long")
    val thr = scored.agg(
        sum(when(y === 1, p)).as("sp1"), count(when(y === 1, 1)).as("n1"),
        sum(when(y === 0, p)).as("sp0"), count(when(y === 0, 1)).as("n0"))
      .select(
        expr("(sp1 - pmod(sp1, n1)) div n1").as("thr_pos_s"),
        expr("(sp0 - pmod(sp0, n0)) div n0").as("thr_neg_s"))
    scored.select(y.as("y"), p.as("p"))
      .crossJoin(broadcast(thr))
      .select(col("y"),
        // coalesce: with a one-class input the other threshold is null
        // (no mean) — nothing can be suspected against it
        coalesce((col("y") === 0 && col("p") >= col("thr_pos_s")) ||
          (col("y") === 1 && col("p") <= col("thr_neg_s")), lit(false))
          .as("suspected"),
        col("thr_pos_s"), col("thr_neg_s"))
      .groupBy("y", "suspected", "thr_pos_s", "thr_neg_s")
      .agg(count(lit(1)).as("n_rows"))
      .select(col("y"), col("suspected"), col("n_rows"),
        col("thr_pos_s"), col("thr_neg_s"))
  }

  /** Fixed-point num/den ratio at 1e-6 scale; null on a zero
    * denominator. Operands are non-negative, so truncating integral
    * division IS floor division — exact and portable.
    */
  private def ratioS(num: Column, den: Column): Column =
    when(den === 0L, lit(null).cast("long"))
      .otherwise(Training.floorDivP(num * lit(S), den))
}

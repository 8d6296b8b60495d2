package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact decision stump over sparse count features — the one-split
  * tree that anchors the classifier family's interpretability end
  * (logistic/NB say "how much of everything"; the stump says "which
  * ONE feature and cut separates best", the go-to first-look on a new
  * labeling task and the weak learner boosting stacks).
  *
  * Split criterion: for candidate (dim, thr), rows with feature count
  * ≥ thr go left, the rest (including rows without the feature — count
  * 0) go right; the score is the fixed-point purity
  *   score = Σ_c nL_c²·1e6 div nL + Σ_c nR_c²·1e6 div nR,
  * the (higher-is-purer) complement of weighted Gini impurity with
  * each side's rational floored at 1e-6 — a DEFINED deterministic
  * criterion both engines reproduce exactly (the true Gini comparison
  * needs cross-multiplied products across candidates; the floored form
  * trades ≤1e-6 of discrimination for integer argmax). Ties break to
  * the lowest (dim, thr).
  *
  * Scale shape: left-side class counts come straight off the SPARSE
  * feature table joined to labels (absent features are right-side by
  * construction — the dense matrix never materializes); thresholds are
  * a constant-size explode; the argmax is a max-struct over the
  * (dims × |thresholds|)-row candidate table. One shuffle on (dim,
  * thr), one 1-row totals broadcast.
  *
  * @param features sparse `(doc_id, dim, c)` counts
  * @param labels   `(doc_id, y)` with y ∈ {0, 1}
  * @param thresholds candidate count cuts, each > 0 (so absent = right)
  * @return one row (dim, thr, score_s, n_left, n_right)
  */
object Stump {

  def fit(features: DataFrame, labels: DataFrame,
      thresholds: Seq[Long] = Seq(1L, 2L, 4L, 8L)): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(_ > 0),
      "thresholds must be positive (count 0 = feature absent = right side)")
    val lab = labels.select(col("doc_id"), col("y").cast("long").as("y"))
    val tot = lab.agg(count(lit(1)).as("n"), sum(col("y")).as("n1"))
    val thrs = array(thresholds.sorted.map(lit): _*)
    val left = features.join(lab, "doc_id")
      .select(col("dim"), col("c"), col("y"), explode(thrs).as("thr"))
      .where(col("c") >= col("thr"))
      .groupBy("dim", "thr")
      .agg(count(lit(1)).as("nl"), sum(col("y")).as("nl1"))
    left.crossJoin(broadcast(tot))
      .select(col("dim"), col("thr"), col("nl"),
        (col("n") - col("nl")).as("nr"),
        col("nl1"), (col("n1") - col("nl1")).as("nr1"))
      .select(col("dim"), col("thr"), col("nl"), col("nr"),
        (expr("(nl1 * nl1 + (nl - nl1) * (nl - nl1)) * 1000000L div nl") +
          when(col("nr") > 0,
            expr("(nr1 * nr1 + (nr - nr1) * (nr - nr1)) * 1000000L div nr"))
            .otherwise(0L)).as("score_s"))
      .agg(max(struct(col("score_s"), (-col("dim")).as("nd"),
        (-col("thr")).as("nt"), col("nl"), col("nr"))).as("m"))
      .select((-col("m.nd")).as("dim"), (-col("m.nt")).as("thr"),
        col("m.score_s").as("score_s"), col("m.nl").as("n_left"),
        col("m.nr").as("n_right"))
  }
}

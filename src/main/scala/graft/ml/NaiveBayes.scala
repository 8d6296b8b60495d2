package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial naive Bayes over sparse hashed token counts — the
  * count-based sibling of [[Training]]'s gradient logistic head: one
  * aggregation pass to fit (no iterations at all), which makes it THE
  * baseline corpus quality-filter to beat, and often the one actually
  * shipped (fastText's supervised mode is this plus a projection).
  *
  * Add-one-smoothed per-class token log-likelihoods,
  *   θ_{c,dim} = (cnt(dim, c) + 1) / (tot_c + V),
  * stored floor-scaled (`floor(ln θ · 1e6)`) — the perplexityScore
  * determinism contract: each log is floored to an integer BEFORE any
  * sum, so document scores are integer sums (order-independent, exact
  * in both engines; ln of the same exact-integer ratio is the same
  * IEEE double everywhere, the cross-perplexity precedent).
  *
  * Scoring: score_c(doc) = prior_c_s + Σ_dim c_doc,dim · w_c_s — all
  * integer arithmetic; the emitted `margin_s` is score₁ − score₀ and
  * the decision is its sign (ties → positive, pinned by ≥).
  *
  * Scale shape: the fit is two partial-aggregated groupBys on (dim) —
  * the model is V rows, broadcast back for scoring; scoring is one
  * (doc, dim)-keyed join + per-doc sum. No driver-side state at all
  * (unlike GD there is not even a weights collect — the model STAYS a
  * DataFrame).
  */
object NaiveBayes {

  /** Fit the per-dim log-likelihood table over the COMPLETE dim domain
    * [0, dims) — dims absent from a class (or from the whole training
    * split) still get their smoothed weight, so scoring never drops a
    * feature.
    *
    * @param features sparse COO counts `(doc_id, dim, c)`
    * @param labels   `(doc_id, y)` with y ∈ {0, 1}; both classes must
    *                 be present (priors are log of class fractions)
    * @return (dim, c1, c0, w1_s, w0_s) — V rows
    */
  def train(features: DataFrame, labels: DataFrame, dims: Int): DataFrame = {
    val lab = labels.select(col("doc_id"), col("y").cast("long").as("y"))
    val counts = features.join(lab, "doc_id")
      .groupBy("dim")
      .agg(sum(when(col("y") === 1, col("c")).otherwise(0L)).as("c1"),
        sum(when(col("y") === 0, col("c")).otherwise(0L)).as("c0"))
    val domain = lab.sparkSession.range(dims).select(col("id").as("dim"))
    val full = domain.join(counts, Seq("dim"), "left")
      .select(col("dim"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c0"), lit(0L)).as("c0"))
    val tot = full.agg(sum(col("c1")).as("tot1"), sum(col("c0")).as("tot0"))
    full.crossJoin(broadcast(tot))
      .select(col("dim"), col("c1"), col("c0"),
        floor(log((col("c1") + lit(1.0)) / (col("tot1") + lit(dims.toDouble)))
          * 1e6).cast("long").as("w1_s"),
        floor(log((col("c0") + lit(1.0)) / (col("tot0") + lit(dims.toDouble)))
          * 1e6).cast("long").as("w0_s"))
  }

  /** Score documents under a trained model: integer margin
    * score₁ − score₀ including the log-prior difference, and the sign
    * decision. Docs with NO features (empty text) score on priors
    * alone — they still get a row (left join from the doc side).
    *
    * @param model  [[train]] output
    * @param priors `(doc_id, y)` rows of the TRAINING split (priors are
    *               re-derived here so the model face stays V rows)
    * @return (doc_id, margin_s, pred)
    */
  def predict(features: DataFrame, docs: DataFrame, model: DataFrame,
      priors: DataFrame): DataFrame = {
    val p = priors.select(col("y").cast("long").as("y"))
      .agg(sum(col("y")).as("n1"), count(lit(1)).as("n"))
      .select(
        (floor(log(col("n1") / col("n").cast("double")) * 1e6) -
          floor(log((col("n") - col("n1")) / col("n").cast("double")) * 1e6))
          .cast("long").as("prior_margin_s"))
    val terms = features
      .join(model.select(col("dim"), (col("w1_s") - col("w0_s")).as("d_s")), "dim")
      .groupBy("doc_id")
      .agg(sum(col("c") * col("d_s")).as("feat_margin_s"))
    docs.select(col("doc_id"))
      .join(terms, Seq("doc_id"), "left")
      .crossJoin(broadcast(p))
      .select(col("doc_id"),
        (coalesce(col("feat_margin_s"), lit(0L)) + col("prior_margin_s"))
          .as("margin_s"))
      .withColumn("pred", (col("margin_s") >= 0).cast("long"))
  }
}

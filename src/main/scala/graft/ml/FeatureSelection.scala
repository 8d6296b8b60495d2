package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chi-square (χ²) feature selection over sparse hashed features — the
  * standard "which buckets actually carry the label" ranking run before
  * fitting a quality-filter head: features whose document-presence is
  * independent of the label are noise to the classifier and (with the
  * hashing trick) candidates for a smaller `dims`.
  *
  * Presence-based 2×2 contingency per feature (the text-classification
  * convention — token COUNTS are power-law and would let one spammy
  * document dominate):
  *
  *   a = #docs with dim & y=1,  b = #docs with dim & y=0
  *   c = P − a (y=1 without),   d = Ng − b (y=0 without)
  *   χ² = N·(a·d − b·c)² / ((a+b)(c+d)(a+c)(b+d)),  N = P + Ng
  *
  * Determinism contract: χ² is an exact RATIONAL in the counts, so it
  * is emitted floor-scaled (`· scale`, integral division) — no float
  * anywhere, the DuckDB twin reproduces every digit.
  *
  * Fixed-point headroom: the numerator N·(ad−bc)²·scale is bounded by
  * scale·N⁵/16 (|ad−bc| ≤ N²/4), which exceeds 2⁶³ past
  * N = (2⁶³·16/scale)^(1/5) (≈ 6850 docs at scale=10; the bound is
  * DERIVED from the caller's scale, not hardcoded to the default's) —
  * GUARDED with a raise_error naming the remediation
  * (select on a bounded labeled slice, or lower `scale`; χ² selection
  * runs on the LABELED sample, which is small by construction — the
  * corpus-sized input is the apply side, not this fit side). For a
  * genuinely huge labeled set, rank by χ²/N (mean-square contingency,
  * headroom N³) instead.
  *
  * Scale shape: one distinct on (doc, dim), one (dim)-keyed partial
  * aggregation, and a designed 1-row broadcast of the class totals —
  * no shuffle wider than the feature-presence list.
  */
object FeatureSelection {

  /** @param features sparse COO features `(doc_id, dim, c)` — only
    *                 presence is used; c > 0 assumed
    * @param labels   `(doc_id, y)` with y ∈ {0, 1}
    * @return (dim, n_pos_docs, n_neg_docs, chi2_s) — one row per dim
    *         present in at least one labeled document
    */
  def chi2(features: DataFrame, labels: DataFrame,
      scale: Long = 10L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    // N⁵·scale/16 < 2⁶³ ⇒ N < (2⁶³·16/scale)^(1/5); the −1 absorbs the
    // double rounding of pow (ADVICE r9: the former hardcoded 6000 was
    // only valid at scale=10 — a larger scale overflowed unguarded)
    val maxDocs =
      math.floor(math.pow(math.pow(2.0, 63) * 16.0 / scale, 0.2)).toLong - 1L
    val lab = labels.select(col("doc_id"), col("y").cast("long").as("y"))
    val present = features.select(col("doc_id"), col("dim")).distinct()
      .join(lab, "doc_id")
    val tot = lab.agg(sum(col("y")).as("n_pos"), count(lit(1)).as("n"))
      .select(
        when(col("n") <= maxDocs, col("n"))
          .otherwise(raise_error(concat(
            lit("chi2: labeled set has "), col("n").cast("string"),
            lit(s" docs, past the fixed-point headroom ($maxDocs at " +
              s"scale=$scale) — select on a bounded labeled slice or " +
              "lower `scale`")))).as("n"),
        col("n_pos"))
    present.groupBy("dim")
      .agg(sum(col("y")).as("a"), (count(lit(1)) - sum(col("y"))).as("b"))
      .crossJoin(broadcast(tot))
      .select(col("dim"), col("a").as("n_pos_docs"), col("b").as("n_neg_docs"),
        expr(s"""CASE WHEN (a + b) > 0 AND (n - a - b) > 0
                 |  AND n_pos > 0 AND (n - n_pos) > 0
                 |THEN (n * (a * ((n - n_pos) - b) - b * (n_pos - a))
                 |      * (a * ((n - n_pos) - b) - b * (n_pos - a)) * $scale)
                 |  div ((a + b) * (n - a - b) * n_pos * (n - n_pos))
                 |ELSE 0L END""".stripMargin).as("chi2_s"))
  }
}

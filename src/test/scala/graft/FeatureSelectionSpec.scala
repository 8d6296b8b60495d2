package graft

import org.apache.spark.sql.functions._

import graft.ml.FeatureSelection

/** χ² feature selection: hand-checked contingency values, independence
  * → 0, the perfectly-predictive ceiling, and the fixed-point headroom
  * guard.
  */
class FeatureSelectionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(feat: Seq[(Long, Long, Long)], lab: Seq[(Long, Long)]) =
    FeatureSelection.chi2(feat.toDF("doc_id", "dim", "c"),
        lab.toDF("doc_id", "y"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, a, b, x) => d -> ((a, b, x)) }.toMap

  test("perfectly predictive feature scores N·scale") {
    // dim 0 in exactly the 3 positive docs of 6: χ² = N = 6 → 60 at ×10
    val lab = Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L), (5L, 0L))
    val feat = Seq((0L, 0L, 1L), (1L, 0L, 2L), (2L, 0L, 1L))
    assert(run(feat, lab)(0L) === ((3L, 0L, 60L)))
  }

  test("label-independent feature scores 0") {
    // dim 7 in half of each class: ad = bc → χ² = 0
    val lab = Seq((0L, 1L), (1L, 1L), (2L, 0L), (3L, 0L))
    val feat = Seq((0L, 7L, 1L), (2L, 7L, 5L))
    assert(run(feat, lab)(7L) === ((1L, 1L, 0L)))
  }

  test("hand-checked asymmetric contingency") {
    // N=5, P=2: dim 3 in a=2 pos, b=1 neg → c=0, d=2
    // χ² = 5·(2·2 − 1·0)² / (3·2·2·3) = 80/36 = 2.22… → 22 at ×10
    val lab = Seq((0L, 1L), (1L, 1L), (2L, 0L), (3L, 0L), (4L, 0L))
    val feat = Seq((0L, 3L, 1L), (1L, 3L, 1L), (2L, 3L, 1L))
    assert(run(feat, lab)(3L) === ((2L, 1L, 22L)))
  }

  test("presence-based: counts don't change the statistic") {
    val lab = Seq((0L, 1L), (1L, 1L), (2L, 0L), (3L, 0L), (4L, 0L))
    val low = Seq((0L, 3L, 1L), (1L, 3L, 1L), (2L, 3L, 1L))
    val high = Seq((0L, 3L, 99L), (1L, 3L, 1L), (2L, 3L, 7L))
    assert(run(low, lab)(3L) === run(high, lab)(3L))
  }

  test("labeled sets past the headroom bound fail loudly") {
    // the bound is DERIVED from scale: (2^63·16/scale)^(1/5) ≈ 6853 at
    // the default scale=10 — 6900 docs trip it
    val lab = (0L until 6900L).map(i => (i, i % 2))
    val feat = Seq((0L, 0L, 1L))
    val e = intercept[Exception] {
      run(feat, lab)
    }
    assert(e.getMessage.contains("fixed-point headroom"))
  }

  test("headroom bound tracks scale: a big scale trips on a small set") {
    // at scale=100000 the bound is ~1084 docs — 1200 must trip it, and
    // the same 1200 docs are FINE at the default scale (the r9 bug:
    // a hardcoded 6000 let this overflow silently)
    import graft.ml.FeatureSelection
    val lab = (0L until 1200L).map(i => (i, i % 2)).toDF("doc_id", "y")
    val feat = Seq((0L, 0L, 1L)).toDF("doc_id", "dim", "c")
    val e = intercept[Exception] {
      FeatureSelection.chi2(feat, lab, scale = 100000L).collect()
    }
    assert(e.getMessage.contains("fixed-point headroom"))
    assert(FeatureSelection.chi2(feat, lab).collect().nonEmpty)
  }
}

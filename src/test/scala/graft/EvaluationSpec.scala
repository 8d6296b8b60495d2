package graft

import graft.ml.Evaluation

class EvaluationSpec extends SparkTestBase {

  import spark.implicits._

  // positives {90, 80, 10}, negatives {80, 10, 5} — one tie at 80 and
  // one at 10, so the average-rank correction is exercised
  private def fixture = Seq(
    (1L, 90L), (1L, 80L), (0L, 80L), (0L, 10L), (1L, 10L), (0L, 5L))
    .toDF("y", "p_s")

  test("aucExact matches the hand-computed tie-corrected U statistic") {
    // pairwise: 3 + (0.5 + 1 + 1) + (0 + 0.5 + 1) = 7 of 9 → AUC 7/9
    val r = Evaluation.aucExact(fixture, "y", "p_s").collect().head
    assert(r.getLong(0) === 3L) // n_pos
    assert(r.getLong(1) === 3L) // n_neg
    assert(r.getLong(2) === 14L, "auc_num_x2 = 2U = 14")
    assert(r.getLong(3) === 18L)
    assert(math.abs(r.getDouble(4) - 7.0 / 9.0) < 1e-12)
  }

  test("aucExact on a single-class corpus reports null, not a crash") {
    val d = Seq((1L, 10L), (1L, 20L)).toDF("y", "p_s")
    val r = Evaluation.aucExact(d, "y", "p_s").collect().head
    assert(r.getLong(1) === 0L)
    assert(r.isNullAt(4))
  }

  test("aucExact is invariant to any strictly monotone score transform") {
    val warped = fixture.selectExpr("y", "p_s * p_s + 7 AS p_s")
    val a = Evaluation.aucExact(fixture, "y", "p_s").collect().head.getDouble(4)
    val b = Evaluation.aucExact(warped, "y", "p_s").collect().head.getDouble(4)
    assert(a === b)
  }

  test("thresholdSweep confusion counts and fixed-point P/R by hand") {
    val out = Evaluation.thresholdSweep(fixture, "y", "p_s", Seq(0L, 50L, 85L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    assert(out(0L) === ((3L, 3L, 0L, 0L, 500000L, 1000000L)))
    assert(out(50L) === ((2L, 1L, 1L, 2L, 666666L, 666666L)))
    assert(out(85L) === ((1L, 0L, 2L, 3L, 1000000L, 333333L)))
  }

  test("aucExactBy: each slice scores as if evaluated alone") {
    // slice a = the hand fixture (AUC 7/9); slice b = perfectly ranked;
    // slice c = single-class (null)
    val sliced = Seq(
      ("a", 1L, 90L), ("a", 1L, 80L), ("a", 0L, 80L),
      ("a", 0L, 10L), ("a", 1L, 10L), ("a", 0L, 5L),
      ("b", 1L, 70L), ("b", 0L, 30L),
      ("c", 1L, 50L), ("c", 1L, 60L))
      .toDF("src", "y", "p_s")
    val got = Evaluation.aucExactBy(sliced, "y", "p_s", Seq("src"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(math.abs(got("a").get - 7.0 / 9.0) < 1e-12)
    assert(got("b").get === 1.0)
    assert(got("c") === None)
    // ungrouped call is the single-slice special case
    val global = Evaluation.aucExact(fixture, "y", "p_s")
      .collect().head.getDouble(4)
    assert(math.abs(global - got("a").get) < 1e-12)
  }

  test("thresholdSweep null precision when nothing is predicted positive") {
    val out = Evaluation.thresholdSweep(fixture, "y", "p_s", Seq(1000L))
      .collect().head
    assert(out.getLong(1) === 0L && out.getLong(2) === 0L)
    assert(out.isNullAt(5), "0/0 precision must be null")
    assert(out.getLong(6) === 0L, "recall is 0, not null (positives exist)")
  }

  test("expectedCalibrationError: perfect calibration 0, hand miscalibration") {
    import spark.implicits._
    // bin 9 (scores 900k-1M): 4 rows, scores sum 3.8e6, 4 positives →
    // perfectly... term = |4e6 − 3.8e6| = 2e5; bin 0: 2 rows score
    // 50k each, 0 pos → term = |0 − 1e5| = 1e5. ECE = 3e5/6 = 50000
    val scored = Seq(
      (1L, 1L, 950000L), (2L, 1L, 950000L), (3L, 1L, 950000L),
      (4L, 1L, 950000L), (5L, 0L, 50000L), (6L, 0L, 50000L))
      .toDF("vec_id", "y", "p_s")
    val got = graft.ml.Evaluation
      .expectedCalibrationError(scored, "y", "p_s")
      .as[(Long, Long, Long)].collect().head
    assert(got === ((2L, 6L, 50000L)))
  }

  test("labelNoiseCounts: cross-threshold examples flagged, thresholds exact") {
    import spark.implicits._
    // positives score {800k, 900k} → thr_pos 850000; negatives
    // {100k, 200k, 840k} → thr_neg 380000. The 840k negative clears
    // thr_pos? no (840k < 850k) → NOT suspected; add a 900k negative
    val scored = Seq(
      (1L, 1L, 800000L), (2L, 1L, 900000L),
      (3L, 0L, 100000L), (4L, 0L, 200000L), (5L, 0L, 900000L),
      (6L, 1L, 300000L)) // a positive scoring below thr_neg → suspected
      .toDF("vec_id", "y", "p_s")
    val got = graft.ml.Evaluation.labelNoiseCounts(scored, "y", "p_s")
      .as[(Long, Boolean, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // thr_pos = floor((800k+900k+300k)/3) = 666666; thr_neg = 400000
    assert(got.values.head._2 === 666666L)
    assert(got.values.head._3 === 400000L)
    assert(got((0L, true))._1 === 1L)   // the 900k negative
    assert(got((0L, false))._1 === 2L)
    assert(got((1L, true))._1 === 1L)   // the 300k positive (≤ 400k)
    assert(got((1L, false))._1 === 2L)
  }

  test("labelNoiseCounts: one-class input suspects nothing") {
    import spark.implicits._
    val scored = Seq((1L, 1L, 500000L), (2L, 1L, 700000L))
      .toDF("vec_id", "y", "p_s")
    val got = graft.ml.Evaluation.labelNoiseCounts(scored, "y", "p_s")
      .as[(Long, Boolean, Long, Option[Long], Option[Long])].collect()
    assert(got.length === 1)
    assert(got.head._1 === 1L && !got.head._2 && got.head._3 === 2L)
    assert(got.head._5.isEmpty, "missing class threshold is null")
  }
}

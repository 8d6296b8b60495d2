package graft

import graft.ml.Conformal

/** Split-conformal thresholds: hand-checked rank indices, the +∞ (NULL)
  * branch when α is too small for n, tie independence, and exact
  * coverage ratios.
  */
class ConformalSpec extends SparkTestBase {
  import spark.implicits._

  private def run(cal: Seq[(Long, Long)], ev: Seq[(Long, Long)],
      alphas: Seq[Long]) =
    Conformal.thresholds(cal.toDF("vec_id", "q_s"), ev.toDF("vec_id", "q_s"),
        alphas)
      .as[(Long, Long, Option[Long], Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("rank index and threshold replay by hand") {
    // n=9 cal scores 10..90; α=0.2 → idx = ceil(10·0.8) = 8 → thr 80
    val cal = (1L to 9L).map(i => (i, i * 10))
    val ev = Seq((100L, 75L), (101L, 80L), (102L, 85L))
    val got = run(cal, ev, Seq(200000L))
    val (nCal, thr, nEval, nCov, cov) = got(200000L)
    assert(nCal === 9L)
    assert(thr === Some(80L))
    assert((nEval, nCov) === ((3L, 2L)))
    assert(cov === 666666L)
  }

  test("alpha too small for n gives the conformal +inf (NULL, full coverage)") {
    // n=3: α=0.05 → idx = ceil(4·0.95) = 4 > 3 → NULL threshold
    val cal = Seq((1L, 10L), (2L, 20L), (3L, 30L))
    val ev = Seq((9L, 999L))
    val got = run(cal, ev, Seq(50000L))
    val (_, thr, _, nCov, cov) = got(50000L)
    assert(thr === None)
    assert(nCov === 1L && cov === 1000000L)
  }

  test("duplicate scores: the rank's VALUE is tie-order independent") {
    val cal = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 20L), (5L, 90L))
    // n=5, α=0.4 → idx = ceil(6·0.6) = 4 → 4th smallest of
    // {10,20,20,20,90} = 20 regardless of which vec_id ranks where
    val got = run(cal, Seq((9L, 20L), (10L, 21L)), Seq(400000L))
    val (_, thr, _, nCov, _) = got(400000L)
    assert(thr === Some(20L))
    assert(nCov === 1L)
  }

  test("empty eval slice keeps every threshold: n_eval 0, coverage NULL") {
    val cal = (1L to 9L).map(i => (i, i * 10))
    val got = Conformal.thresholds(cal.toDF("vec_id", "q_s"),
        Seq.empty[(Long, Long)].toDF("vec_id", "q_s"),
        Seq(200000L, 500000L))
      .as[(Long, Long, Option[Long], Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got.keySet === Set(200000L, 500000L))
    assert(got(200000L) === ((9L, Some(80L), 0L, 0L, None)))
    assert(got(500000L) === ((9L, Some(50L), 0L, 0L, None)))
  }

  test("duplicate alphas are rejected loudly") {
    intercept[IllegalArgumentException] {
      Conformal.thresholds(Seq((1L, 10L)).toDF("vec_id", "q_s"),
        Seq((2L, 10L)).toDF("vec_id", "q_s"), Seq(200000L, 200000L))
    }
  }

  test("multiple alphas come back in one pass with distinct thresholds") {
    val cal = (1L to 19L).map(i => (i, i))
    val got = run(cal, Seq((100L, 10L)), Seq(100000L, 500000L))
    // α=0.1: ceil(20·0.9)=18 → thr 18; α=0.5: ceil(20·0.5)=10 → thr 10
    assert(got(100000L)._2 === Some(18L))
    assert(got(500000L)._2 === Some(10L))
    assert(got(100000L)._4 === 1L)  // 10 <= 18 covered
    assert(got(500000L)._4 === 1L)  // 10 <= 10 covered (inclusive)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ml.NaiveBayes

/** Multinomial naive Bayes: weights against an in-test scala replay of
  * the smoothed log-likelihoods, smoothing over never-seen dims,
  * prior-only scoring of empty documents, and separable-fixture
  * accuracy.
  */
class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  // train counts: class 1 docs use dim 0 heavily, class 0 docs dim 1
  private val feats = Seq(
    (0L, 0L, 4L), (0L, 1L, 1L),
    (1L, 0L, 3L),
    (2L, 1L, 5L),
    (3L, 1L, 2L), (3L, 0L, 1L))
  private val labs = Seq((0L, 1L), (1L, 1L), (2L, 0L), (3L, 0L))
  private val dims = 4

  private def w(c: Long, tot: Long): Long =
    math.floor(math.log((c + 1.0) / (tot + dims.toDouble)) * 1e6).toLong

  test("weights replay the smoothed log-likelihoods exactly") {
    val m = NaiveBayes.train(feats.toDF("doc_id", "dim", "c"),
        labs.toDF("doc_id", "y"), dims)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (d, c1, c0, w1, w0) => d -> ((c1, c0, w1, w0)) }.toMap
    // class 1: dim0=7, dim1=1, tot=8; class 0: dim0=1, dim1=7, tot=8
    assert(m(0L) === ((7L, 1L, w(7, 8), w(1, 8))))
    assert(m(1L) === ((1L, 7L, w(1, 8), w(7, 8))))
    // never-seen dims still carry the smoothed floor
    assert(m(2L) === ((0L, 0L, w(0, 8), w(0, 8))))
    assert(m.size === dims)
  }

  test("empty documents score on priors alone") {
    val model = NaiveBayes.train(feats.toDF("doc_id", "dim", "c"),
      labs.toDF("doc_id", "y"), dims)
    val out = NaiveBayes.predict(
        Seq.empty[(Long, Long, Long)].toDF("doc_id", "dim", "c"),
        Seq(Tuple1(9L)).toDF("doc_id"),
        model, labs.toDF("doc_id", "y"))
      .as[(Long, Long, Long)].collect()
    // balanced priors: floor(ln .5·1e6) − floor(ln .5·1e6) = 0 → pred 1 (≥)
    assert(out === Array((9L, 0L, 1L)))
  }

  test("separable fixture classifies held-out docs by dominant dim") {
    val model = NaiveBayes.train(feats.toDF("doc_id", "dim", "c"),
      labs.toDF("doc_id", "y"), dims)
    val test = Seq((10L, 0L, 6L), (11L, 1L, 6L)).toDF("doc_id", "dim", "c")
    val out = NaiveBayes.predict(test, Seq(10L, 11L).toDF("doc_id"),
        model, labs.toDF("doc_id", "y"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, m, p) => id -> ((m, p)) }.toMap
    assert(out(10L)._2 === 1L) // dim-0-heavy → class 1
    assert(out(11L)._2 === 0L)
    // margin replays exactly: 6·(w1(dim0) − w0(dim0)) + 0 prior
    assert(out(10L)._1 === 6L * (w(7, 8) - w(1, 8)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ml.Inference

class InferenceSpec extends SparkTestBase {

  private def w(c: Int, d: Int): Long =
    ((c.toLong * 64L + 1L + d) * 2654435761L) % 1000003L - 501001L

  private def score(xs: Seq[Float], c: Int): Long =
    xs.zipWithIndex.map { case (x, i) =>
      math.floor(x.toDouble * w(c, i).toDouble).toLong
    }.sum

  test("linearClassify matches the hand-rolled fixed-point scores") {
    import spark.implicits._
    val rows = Seq(
      0L -> Seq(0.5f, -1.0f, 2.0f),
      1L -> Seq(1.0f, 0.0f, 0.0f),
      2L -> Seq(-0.25f, 0.75f, -0.5f))
    val d = rows.toDF("vec_id", "embedding")
    val out = Inference.linearClassify(d, nClasses = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for ((vid, xs) <- rows) {
      val scores = (0 until 4).map(c => c -> score(xs, c))
      val (predC, predS) = scores.maxBy { case (c, s) => (s, -c) }
      val runnerUp = scores.filter(_._1 != predC).map(_._2).max
      assert(out(vid) === ((predC.toLong, predS, predS - runnerUp)),
        s"vec $vid: got ${out(vid)}, scores $scores")
    }
  }

  test("all-tie scores break to the lowest class with zero margin") {
    import spark.implicits._
    // a zero vector scores 0 for every class: argmax must be class 0,
    // margin 0 — the tie-break contract
    val d = Seq(9L -> Seq(0f, 0f, 0f)).toDF("vec_id", "embedding")
    val out = Inference.linearClassify(d, nClasses = 4).collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) === ((0L, 0L, 0L)))
  }

  test("linearClassifyWeights with the grid weights == linearClassify") {
    import spark.implicits._
    val d = (0L until 20L).map(i =>
        i -> Seq.tabulate(5)(dd => ((i * 13 + dd * 7) % 19 - 9).toFloat / 4f))
      .toDF("vec_id", "embedding")
    // handing the deterministic grid in as an explicit weight matrix
    // must reproduce the built-in face exactly
    val grid = (0 until 4).map(c => (0 until 5).map(dd => w(c, dd)))
    def collectC(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(collectC(Inference.linearClassifyWeights(d, grid)) ===
      collectC(Inference.linearClassify(d, nClasses = 4)))
    // weight rows of mismatched width are rejected loudly
    val ex = intercept[IllegalArgumentException] {
      Inference.linearClassifyWeights(d, Seq(Seq(1L, 2L), Seq(1L)))
    }
    assert(ex.getMessage.contains("same width"))
  }

  test("batch inference is map-only: no exchange in the plan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Inference.linearClassify(emb, nClasses = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"inference plan shuffles:\n$plan")
  }
}

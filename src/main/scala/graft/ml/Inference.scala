package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch model inference as columnar math — the "apply the trained
  * filter model to the whole corpus" step of a training-data pipeline
  * (fastText-style quality classifiers, language scorers, topic
  * routers). A linear model over an embedding column needs no UDF and
  * no model server: each class score is one fused multiply-floor-sum
  * over the array, codegen'd by Catalyst, and argmax is an array sort
  * over a literal-width struct array.
  *
  * Scale shape: map-only — a pure projection over the scan, no
  * shuffle, no driver state, trivially pipelined with whatever filter
  * consumes the prediction. At 100 TB batch inference IS the scan.
  *
  * Determinism: weights are integer (the same Knuth multiplicative
  * grid as the LSH hyperplanes — `w(c,d) = ((c·64+1+d) · 2654435761)
  * mod 1000003 − 501001`), and each term is floor(x·w) summed as
  * BIGINT, so scores, argmax and margins are bit-identical in any
  * engine — the DuckDB oracle checks all three. A real deployment
  * would swap [[weight]] for a broadcast weight matrix (same plan
  * shape: literal array → broadcast array column).
  */
object Inference {

  /** Integer weight of (class, dim): deterministic pseudo-random grid,
    * centered on zero. `d` is 0-based.
    */
  private def weight(cls: Int, d: Column): Column =
    ((lit(cls.toLong * 64L + 1L) + d) * 2654435761L) % 1000003L - 501001L

  /** Fixed-point class score: Σ_d floor(x_d · w(cls, d)) as BIGINT. */
  def classScore(emb: Column, cls: Int): Column =
    aggregate(
      zip_with(emb, sequence(lit(0L), size(emb).cast("long") - 1L),
        (x, d) => floor(x.cast("double") * weight(cls, d).cast("double")).cast("long")),
      lit(0L), (acc, t) => acc + t)

  /** Linear classifier inference over `vectors(vec_id, embedding)`:
    * returns (vec_id, pred_class, pred_score_s, margin_s) — the argmax
    * class (ties → lowest class id), its fixed-point score, and the
    * margin to the runner-up (the standard router/filter confidence
    * signal). Map-only; see the object scaladoc for the scale argument.
    */
  def linearClassify(vectors: DataFrame, nClasses: Int): DataFrame = {
    require(nClasses >= 2, s"nClasses must be >= 2, got $nClasses")
    classifyByScores(vectors,
      (0 until nClasses).map(c => classScore(col("embedding"), c)))
  }

  /** The TRAINED-model face: the caller supplies the weight matrix
    * (class → per-dimension integer weights, e.g. a quantized logistic
    * head), which ships as literal arrays in the plan — the broadcast-
    * variable pattern without even a broadcast, since a classifier head
    * is a few KB. Same fixed-point term contract as [[linearClassify]]
    * (floor(x_d · w_cd) summed as BIGINT), same map-only plan, same
    * output shape. Rows whose embedding is shorter than a weight row
    * score only the shared prefix (zip_with pads with null → those
    * terms drop out of the sum via coalesce-to-zero).
    */
  def linearClassifyWeights(vectors: DataFrame,
      weights: Seq[Seq[Long]]): DataFrame = {
    require(weights.size >= 2, s"need >= 2 classes, got ${weights.size}")
    require(weights.forall(_.size == weights.head.size),
      "all weight rows must have the same width")
    val scores = weights.map { w =>
      val wCol = array(w.map(lit): _*)
      aggregate(
        zip_with(col("embedding"), wCol, (x, wv) =>
          coalesce(floor(x.cast("double") * wv.cast("double")).cast("long"),
            lit(0L))),
        lit(0L), (acc, t) => acc + t)
    }
    classifyByScores(vectors, scores)
  }

  /** Shared argmax/margin projection over per-class score columns. */
  private def classifyByScores(vectors: DataFrame,
      scores: Seq[Column]): DataFrame = {
    // struct sort order: score desc, then negc desc = class asc — the
    // array_sort(desc) pulls (highest score, lowest class) to slot 1
    val tagged = scores.zipWithIndex.map { case (s, c) =>
      struct(s.as("score_s"), lit(-c.toLong).as("negc"))
    }
    val sorted = sort_array(array(tagged: _*), asc = false)
    vectors.select(col("vec_id"),
      (-element_at(sorted, 1).getField("negc")).as("pred_class"),
      element_at(sorted, 1).getField("score_s").as("pred_score_s"),
      (element_at(sorted, 1).getField("score_s") -
        element_at(sorted, 2).getField("score_s")).as("margin_s"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ml.{Evaluation, Features, Training}

class FeaturesSpec extends SparkTestBase {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("hashedFeatures: dense tf vector agrees with the sparse COO face") {
    val d = docs(
      (1L, "the cat sat on the mat", "en"),
      (2L, "der hund", "de"),
      (3L, "one", "en"))
    val dims = 8
    val dense = Features.hashedFeatures(d, dims).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(dense.keySet === Set(1L, 2L, 3L))
    assert(dense.values.forall(_.length === dims))
    // every vector is an L1-normalized count histogram
    dense.foreach { case (id, v) =>
      assert(math.abs(v.sum - 1.0) < 1e-9, s"doc $id sums to ${v.sum}")
      assert(v.forall(x => x >= 0.0 && x <= 1.0), s"doc $id out of range")
    }
    // the dense entries are exactly sparse c / n_toks
    val sparse = Features.hashedFeaturesSparse(d, dims).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val nToks = sparse.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    sparse.foreach { case ((id, dim), c) =>
      assert(dense(id)(dim) === c.toDouble / nToks(id))
    }
    // zero buckets really are zero
    val nonzero = sparse.keySet
    dense.foreach { case (id, v) =>
      v.zipWithIndex.foreach { case (x, dim) =>
        if (!nonzero.contains((id, dim))) assert(x === 0.0)
      }
    }
  }

  test("hashedFeatures is deterministic and vocabulary-free across corpora") {
    // the same document embeds identically regardless of what else is
    // in the corpus — the defining hashing-trick property (no vocab)
    val alone = Features.hashedFeatures(docs((7L, "alpha beta gamma", "en")), 8)
      .collect().head.getSeq[Double](1)
    val crowd = Features.hashedFeatures(docs(
      (7L, "alpha beta gamma", "en"),
      (8L, "delta epsilon", "en"),
      (9L, "zeta eta theta iota", "de")), 8)
      .where(col("vec_id") === 7L).collect().head.getSeq[Double](1)
    assert(alone === crowd)
  }

  test("hashed tf features train a head end-to-end") {
    // two token dialects in disjoint hash buckets mod 8 (alpha→6,
    // beta→0 vs dog→4, moon→1; same-letter pairs like 'aa'/'zz' would
    // ALL collide in bucket 0 — their hash is 32·c)
    val d = docs(
      (0L to 9L).map(i =>
        (i, if (i < 5) "alpha beta alpha beta alpha" else "dog moon dog moon dog",
          if (i < 5) "en" else "de")): _*)
    val feats = Features.hashedFeatures(d, 8)
      .join(d.select(col("doc_id").as("vec_id"),
        (col("lang") === "en").cast("long").as("y")), "vec_id")
    val w = Training.trainLogisticWeights(feats, "y", iters = 5)
    val auc = Evaluation.aucExact(
      Training.logisticPredict(feats, w)
        .join(feats.select(col("vec_id"), col("y")), "vec_id"),
      "y", "p_s").collect().head.getAs[Double]("auc")
    assert(auc === 1.0, s"separable dialects must rank perfectly, got $auc")
  }

  test("calibrationBins: equal widths, closed top bin, exact counts") {
    import spark.implicits._
    val scored = Seq(
      (0L, 0L), (99999L, 0L), // bin 0
      (100000L, 1L), // bin 1: left-closed edge
      (950000L, 1L), (1000000L, 1L) // bin 9: exact 1e6 clamps into top
    ).toDF("p_s", "y")
    val bins = Evaluation.calibrationBins(scored, "y", "p_s").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(bins === Map(
      0L -> ((2L, 0L, 99999L)),
      1L -> ((1L, 1L, 100000L)),
      9L -> ((2L, 2L, 1950000L))))
  }
}

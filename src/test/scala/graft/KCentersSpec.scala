package graft

import graft.similarity.Similarity

class KCentersSpec extends SparkTestBase {

  // a=(1,0), d=-a, b orthogonal, c nearly parallel to a: farthest-first
  // from a must pick the antipode, then the orthogonal, then the clone
  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.01f)),
      (4L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
  }

  test("selection order is antipode, orthogonal, near-duplicate last") {
    val got = Similarity.kCenters(vecs, k = 4)
      .orderBy("sel_round").collect().map(_.getLong(1)).toSeq
    assert(got === Seq(1L, 4L, 2L, 3L))
  }

  test("round-2 similarity is the exact signed square of the antipode") {
    val r2 = Similarity.kCenters(vecs, k = 2)
      .where(org.apache.spark.sql.functions.col("sel_round") === 2L)
      .collect().head
    assert(r2.getLong(1) === 4L)
    // dot(a,d) = -127·127; signed-sq cosine = -scale exactly
    assert(r2.getLong(2) === -1000000L)
  }

  test("coverage report: masses, tie-to-lowest-round, exact worst sims") {
    val got = Similarity.kCentersCover(vecs, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // centers 1 and 4; vec 2 is orthogonal to both (tie 0 → round 1),
    // vec 3 assigns to 1 at floor(16129e6/16130) = 999938; each center
    // covers itself at exactly scale
    assert(got === Map(1L -> ((3L, 0L)), 2L -> ((1L, 1000000L))))
  }

  test("zero vectors are excluded and partitioning does not matter") {
    import spark.implicits._
    val withZero = vecs.unionAll(
      Seq((0L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val a = Similarity.kCenters(withZero, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Similarity.kCenters(withZero.repartition(7), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
    assert(a.map(_._2).toSet === Set(1L, 4L, 2L))
  }
}

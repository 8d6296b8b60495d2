package graft

import graft.similarity.Similarity

class SignProjectSpec extends SparkTestBase {

  private val P = 2147483647L

  // reference sign: iterated mid-square parity of the cell key —
  // independent reimplementation of the engine's HOF expression
  private def sgn(i: Int, j: Int): Long = {
    val x = i.toLong * 4096 + j
    val h1 = (x * x + 12345) % P
    if (((h1 * h1 + 6789) % P) % 2 == 0) 1L else -1L
  }

  test("projections equal the reference computation on exact codes") {
    import spark.implicits._
    // components quantize exactly: amax=1 → q = (127, 64, -127, 0)
    val df = Seq((1L, Seq(1.0f, 0.5f, -1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq(127L, 64L, -127L, 0L)
    val want = (0 until 8).map(j => q.indices.map(i => sgn(i, j) * q(i)).sum)
    val got = Similarity.signProject(df, 8)
      .orderBy("dim").collect().map(_.getLong(2)).toSeq
    assert(got === want)
  }

  test("a one-hot vector projects to ±127 in every output dim") {
    import spark.implicits._
    val df = Seq((7L, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.signProject(df, 16).collect()
    assert(got.length === 16)
    assert(got.forall(r => math.abs(r.getLong(2)) === 127L))
  }

  test("native kernel equals the nested-HOF formulation") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.3f, -2.5f, 1.1f, 0.0f, 9.9f)),
      (2L, Seq(-1.0f, 4.25f, 0.5f)), (3L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.signProject(df, 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = Similarity.signProjectHof(df, 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a === b)
  }

  test("zero vectors project to exact zeros; signs are deterministic") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(3.0f, -4.0f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.signProject(df, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = Similarity.signProject(df.repartition(5), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a === b)
    assert(a.filter(_._1 == 1L).forall(_._3 === 0L))
  }
}

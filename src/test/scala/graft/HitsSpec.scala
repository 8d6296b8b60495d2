package graft

import graft.graph.Hits

class HitsSpec extends SparkTestBase {

  // bipartite: 1→A(10), 1→B(11), 2→B(11); hub 1 dominates (points at
  // both authorities), authority B dominates (two in-links)
  private def edges = {
    import spark.implicits._
    Seq(1L -> 10L, 1L -> 11L, 2L -> 11L).toDF("src", "dst")
  }

  private def scores(iters: Int) =
    Hits.run(edges, iters, scale = 100L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("two iterations match the hand computation at scale 100") {
    val got = scores(2)
    // h0 = 100 everywhere
    // a1 raw: A=100 B=200 -> max 200 -> a1: A=50 B=100
    // h1 raw: 1=150 2=100 -> max 150 -> h1: 1=100 2=66
    // a2 raw: A=100 B=166 -> max 166 -> a2: A=60 B=100
    // h2 raw: 1=160 2=100 -> max 160 -> h2: 1=100 2=62
    assert(got(1L) === ((100L, 0L)))
    assert(got(2L) === ((62L, 0L)))
    assert(got(10L) === ((0L, 60L)))
    assert(got(11L) === ((0L, 100L)))
  }

  test("the best hub and authority hold exactly scale every iteration") {
    for (i <- 1 to 3) {
      val got = scores(i)
      assert(got.values.map(_._1).max === 100L, s"hub max at iter $i")
      assert(got.values.map(_._2).max === 100L, s"auth max at iter $i")
    }
  }

  test("integer arithmetic makes repeated runs bit-identical") {
    import spark.implicits._
    val sym = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 1L -> 3L)
      .toDF("src", "dst")
    val a = Hits.run(sym.repartition(7), iters = 4, scale = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Hits.run(sym.repartition(2), iters = 4, scale = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a === b)
  }

  test("a hub past the fixed-point headroom fails loudly") {
    import spark.implicits._
    // scale = 2^32: the rescale needs max·scale ≤ 2^63−1, i.e. a max
    // half-step sum of ≤ 2^31−1 — a 3-in-degree hub sums 3·2^32 and
    // must trip the guard, the same cliff a ~9e6-degree hub hits at
    // the default 1e6 scale
    val star = Seq(1L -> 9L, 2L -> 9L, 3L -> 9L).toDF("src", "dst")
    val e = intercept[Exception] {
      Hits.run(star, iters = 1, scale = 1L << 32).collect()
    }
    assert(e.getMessage.contains("fixed-point headroom"),
      s"expected the hits guard, got: ${e.getMessage}")
    // the default scale handles the same graph fine
    assert(Hits.run(star, iters = 1).count() === 4L)
  }
}

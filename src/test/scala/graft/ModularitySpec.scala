package graft

import graft.graph.Modularity

class ModularitySpec extends SparkTestBase {

  // triangle {1,2,3} plus a disjoint edge {4,5}: m = 4, degrees
  // 1:2 2:2 3:2 4:1 5:1
  private def edges = {
    import spark.implicits._
    Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 4L -> 5L).toDF("src", "dst")
  }

  private def terms(labels: org.apache.spark.sql.DataFrame) =
    Modularity.communityTerms(edges, labels).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap

  test("terms match the hand computation on the natural partition") {
    import spark.implicits._
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L)
      .toDF("node", "component")
    val got = terms(labels)
    // comm 1: L=3, D=6 -> 1e6*3//4 - 1e6*36//64 = 750000 - 562500
    assert(got(1L) === ((3L, 3L, 6L, 187500L)))
    // comm 4: L=1, D=2 -> 250000 - 1e6*4//64 = 250000 - 62500
    assert(got(4L) === ((2L, 1L, 2L, 187500L)))
    // Q = sum/1e6 = 0.375 for this partition
    assert(got.values.map(_._4).sum === 375000L)
  }

  test("unlabeled nodes default to singletons; inter edges drop terms") {
    import spark.implicits._
    // only the triangle is labeled; 4 and 5 become singleton
    // communities whose shared edge is inter-community mass
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L).toDF("node", "component")
    val got = terms(labels)
    assert(got(1L) === ((3L, 3L, 6L, 187500L)))
    // singleton 4: L=0, D=1 -> 0 - 1e6*1//64 = -15625 (worse than the
    // merged {4,5} community: splitting a real edge costs modularity)
    assert(got(4L) === ((1L, 0L, 1L, -15625L)))
    assert(got(5L) === ((1L, 0L, 1L, -15625L)))
  }

  test("a hub community past the fixed-point headroom fails loudly") {
    import spark.implicits._
    // scale = 2^61 shrinks the degree-sum bound to 2, so the star hub
    // (degree 3) crosses the same cliff a multi-million-degree
    // community would at the default 1e6 scale — the job must fail
    // with the named guard, never wrap into a plausible-looking score
    val star = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L).toDF("src", "dst")
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
      .toDF("node", "component")
    val e = intercept[Exception] {
      Modularity.communityTerms(star, labels, scale = 1L << 61).collect()
    }
    assert(e.getMessage.contains("fixed-point headroom"),
      s"expected the modularity guard, got: ${e.getMessage}")
    // the default scale handles the same graph fine
    assert(Modularity.communityTerms(star, labels).count() === 1L)
  }
}

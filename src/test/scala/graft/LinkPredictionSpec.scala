package graft

import graft.graph.LinkPrediction

class LinkPredictionSpec extends SparkTestBase {

  // triangle 1-2-3 plus 4 adjacent to 1 and 2: the only non-adjacent
  // distance-2 pair is (3,4), witnessed by both 1 and 2
  private def edges = {
    import spark.implicits._
    Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 4L -> 1L, 2L -> 4L).toDF("src", "dst")
  }

  test("the trio matches the hand computation at scale 100") {
    val got = LinkPrediction.scores(edges, scale = 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // deg: 1→3, 2→3, 3→2, 4→2; cn(3,4)=2 via {1,2}
    // jaccard = 2*100 div (2+2-2) = 100; ra = 100 div 3 + 100 div 3 = 66
    assert(got.toSeq === Seq((3L, 4L, 2L, 100L, 66L)))
  }

  test("hub cap drops witnesses, minCommon drops thin pairs") {
    // cap 2 excludes both witnesses (deg 3) → no scored pairs
    assert(LinkPrediction.scores(edges, maxDegree = 2L).isEmpty)
    // minCommon 3 exceeds the pair's two witnesses
    assert(LinkPrediction.scores(edges, minCommon = 3L).isEmpty)
  }

  test("orientation and duplicate edges do not change the scores") {
    import spark.implicits._
    val noisy = Seq(2L -> 1L, 1L -> 2L, 3L -> 1L, 2L -> 3L, 4L -> 1L,
      4L -> 2L, 2L -> 4L).toDF("src", "dst")
    val a = LinkPrediction.scores(edges, scale = 100L).collect().toSeq
    val b = LinkPrediction.scores(noisy, scale = 100L).collect().toSeq
    assert(a === b)
  }
}

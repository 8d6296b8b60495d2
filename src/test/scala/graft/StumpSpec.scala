package graft

import graft.ml.Stump

/** Decision stump: separable fixtures, threshold selection, absent
  * features landing right, purity replay, and tie-breaking.
  */
class StumpSpec extends SparkTestBase {
  import spark.implicits._

  private def fit(feat: Seq[(Long, Long, Long)], lab: Seq[(Long, Long)],
      thrs: Seq[Long] = Seq(1L, 2L, 4L, 8L)) =
    Stump.fit(feat.toDF("doc_id", "dim", "c"), lab.toDF("doc_id", "y"), thrs)
      .as[(Long, Long, Long, Long, Long)].collect().head

  test("perfectly separating presence split wins with max purity") {
    // dim 3 present exactly in the 2 positives of 4 docs
    val lab = Seq((0L, 1L), (1L, 1L), (2L, 0L), (3L, 0L))
    val feat = Seq((0L, 3L, 2L), (1L, 3L, 1L), (2L, 7L, 5L))
    val (dim, thr, score, nl, nr) = fit(feat, lab)
    assert((dim, thr, nl, nr) === ((3L, 1L, 2L, 2L)))
    // pure sides: (4+0)·1e6/2 + (0+4)·1e6/2 = 4e6... per side:
    // (nl1²+(nl−nl1)²)·1e6 div nl = 4·1e6/2 = 2e6 each
    assert(score === 4000000L)
  }

  test("the COUNT cut matters: presence alone mixes, c >= 4 separates") {
    // every doc has dim 5; positives have it ≥ 4 times
    val lab = Seq((0L, 1L), (1L, 1L), (2L, 0L), (3L, 0L))
    val feat = Seq((0L, 5L, 6L), (1L, 5L, 4L), (2L, 5L, 1L), (3L, 5L, 2L))
    val (dim, thr, _, nl, nr) = fit(feat, lab)
    assert((dim, thr, nl, nr) === ((5L, 4L, 2L, 2L)))
  }

  test("absent features fall right: stump replays by hand") {
    // dim 1 in docs {0, 1, 2} (counts 3, 1, 1); doc 3 has nothing
    val lab = Seq((0L, 1L), (1L, 1L), (2L, 0L), (3L, 0L))
    val feat = Seq((0L, 1L, 3L), (1L, 1L, 1L), (2L, 1L, 1L))
    val (dim, thr, score, nl, nr) = fit(feat, lab, Seq(1L, 2L))
    // thr=2: left {0} pure (1e6), right {1,2,3} has 1 pos 2 neg →
    //   (1+4)·1e6 div 3 = 1666666 → total 2666666
    // thr=1: left {0,1,2} 2 pos 1 neg → (4+1)·1e6 div 3 = 1666666;
    //   right {3} pure 1e6 → total 2666666 — TIE → lowest thr wins
    assert((dim, thr) === ((1L, 1L)))
    assert(score === 2666666L)
    assert((nl, nr) === ((3L, 1L)))
  }

  test("tie on score breaks to the lowest dim") {
    // two dims with mirror-image perfect splits
    val lab = Seq((0L, 1L), (1L, 0L))
    val feat = Seq((0L, 9L, 1L), (1L, 4L, 1L))
    val (dim, _, _, _, _) = fit(feat, lab, Seq(1L))
    assert(dim === 4L)
  }
}

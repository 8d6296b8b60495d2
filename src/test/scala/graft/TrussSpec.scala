package graft

import graft.graph.Truss

/** k-truss peel: hand fixtures where the cascade matters, convergence
  * no-ops, orientation invariance, and the loud round cap.
  */
class TrussSpec extends SparkTestBase {
  import spark.implicits._

  private def truss(edges: Seq[(Long, Long)], k: Int,
      maxRounds: Int = 30): Map[(Long, Long), Boolean] =
    Truss.edges(edges.toDF("src", "dst"), k, maxRounds)
      .as[(Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  // K4: every edge closes 2 triangles — the smallest 4-truss
  private val k4 = for {
    a <- 0L to 3L; b <- 0L to 3L if a < b
  } yield (a, b)

  test("K4 is a 4-truss; a pendant edge is not") {
    val got = truss(k4 :+ ((3L, 9L)), k = 4)
    k4.foreach(e => assert(got(e), s"K4 edge $e must survive"))
    assert(!got((3L, 9L)), "pendant closes no triangle")
  }

  test("peel cascades: one removal drops its dependents") {
    // K4 plus vertex 4 attached to 0,1 only: edges (0,4),(1,4) each
    // close ONE triangle (0,1,4) → removed at k=4; edge (0,1) loses
    // that triangle but keeps its two K4 triangles → survives
    val g = k4 ++ Seq((0L, 4L), (1L, 4L))
    val got = truss(g, k = 4)
    assert(!got((0L, 4L)) && !got((1L, 4L)))
    assert(got((0L, 1L)))
    // at k=5 (support 3) nothing in this graph survives
    assert(truss(g, k = 5).values.forall(!_))
  }

  test("two triangles sharing an edge form a 3-truss but not a 4-truss") {
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (1L, 3L), (2L, 3L))
    val t3 = truss(g, k = 3)
    assert(t3.values.forall(identity), "every edge closes >=1 triangle")
    val t4 = truss(g, k = 4)
    // only (1,2) closes two triangles, but its neighbours die → cascade
    assert(t4.values.forall(!_))
  }

  test("orientation and duplicates don't matter") {
    val fwd = truss(k4, k = 4)
    val mixed = truss(k4.map(_.swap) ++ k4, k = 4)
    assert(fwd === mixed)
  }

  test("loud cap on a peel deeper than maxRounds") {
    // chain of triangles: peeling eats one link per round
    val chain = (0L until 12L).flatMap(i =>
      Seq((i, i + 1), (i, i + 2), (i + 1, i + 2)))
    val e = intercept[IllegalArgumentException] {
      truss(chain, k = 4, maxRounds = 2)
    }
    assert(e.getMessage.contains("raise maxRounds"))
  }
}

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

  test("low-id hub: star edges die, the high-id K4 survives intact") {
    // node 0 is a degree-60 hub whose edges close no triangles — under
    // the r9 id-canonical wedge enumeration this shape generated
    // deg²/2 wedges from the hub's lower-id role; degree orientation
    // gives the hub out-degree ~0 (every neighbour has lower degree,
    // so edges orient INTO... away from the hub) and the wedge work
    // collapses. Correctness: the K4 at 100..103 still peels exactly.
    val star = (1L to 60L).map(i => (0L, i))
    val k4hi = for { a <- 100L to 103L; b <- 100L to 103L if a < b } yield (a, b)
    val got = truss(star ++ k4hi, k = 4)
    star.foreach(e => assert(!got(e), s"hub edge $e closes no triangle"))
    k4hi.foreach(e => assert(got(e), s"K4 edge $e must survive"))
    // hub with SOME closure: triangles (0,1,2) and (0,2,3) ride the
    // star; at k=3 exactly those five closing edges survive
    val g3 = star ++ Seq((1L, 2L), (2L, 3L))
    val t3 = truss(g3, k = 3)
    val survivors = t3.filter(_._2).keySet
    assert(survivors === Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 3L)))
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

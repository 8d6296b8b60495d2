package graft

import org.apache.spark.sql.functions._

import graft.graph.Centrality

/** Clustering coefficients and closeness centrality: hand-checkable
  * fixture graphs (triangle, star, path, islet) plus a random-graph
  * cross-check of the per-source BFS against an in-test queue BFS
  * run once per seed.
  */
class CentralitySpec extends SparkTestBase {
  import spark.implicits._

  // symmetric edge list (both directions) from undirected pairs
  private def sym(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs.flatMap(p => Seq(p, (p._2, p._1)))

  test("clustering coefficient: triangle is fully clustered") {
    val cc = Centrality.clusteringCoefficients(
        sym((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(cc === Set((1L, 2L, 1L, 1000000L), (2L, 2L, 1L, 1000000L),
      (3L, 2L, 1L, 1000000L)))
  }

  test("clustering coefficient: star hub and leaves are 0") {
    val cc = Centrality.clusteringCoefficients(
        sym((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (n, d, t, c) => n -> ((d, t, c)) }.toMap
    assert(cc(0L) === ((3L, 0L, 0L)))   // deg 3, no closed wedge
    assert(cc(1L) === ((1L, 0L, 0L)))   // deg 1: no wedges by convention
  }

  test("clustering coefficient: triangle with a pendant — exact ratio") {
    // node 1 in triangle {1,2,3} plus pendant 4: deg 3, 1 triangle,
    // cc = 2/(3·2) = 1/3 → 333333 floor-scaled
    val cc = Centrality.clusteringCoefficients(
        sym((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (n, d, t, c) => n -> ((d, t, c)) }.toMap
    assert(cc(1L) === ((3L, 1L, 333333L)))
    assert(cc(2L) === ((2L, 1L, 1000000L)))
    assert(cc(4L) === ((1L, 0L, 0L)))
  }

  test("perSourceHopDistance keeps waves separate per seed") {
    // path 1-2-3-4, seeds {1, 4}: per-pair distances, not the min-over-
    // seeds that hopDistance computes
    val d = Centrality.perSourceHopDistance(
        sym((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"),
        Seq(1L, 4L).toDF("node"))
      .as[(Long, Long, Long)].collect().toSet
    assert(d === Set(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 3L),
      (4L, 4L, 0L), (4L, 3L, 1L), (4L, 2L, 2L), (4L, 1L, 3L)))
  }

  test("perSourceHopDistance matches per-seed queue BFS on a random graph") {
    val rnd = new scala.util.Random(23)
    val n = 60
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    val seeds = Seq(0L, 7L, 13L)
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def queueBfs(s: Long): Map[Long, Long] = {
      var dist = Map(s -> 0L); var frontier = Set(s); var hop = 0L
      while (frontier.nonEmpty) {
        hop += 1
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)).diff(dist.keySet)
        dist ++= next.map(_ -> hop); frontier = next
      }
      dist
    }
    val expect = seeds.flatMap(s => queueBfs(s).map { case (v, d) => (s, v, d) }).toSet
    val got = Centrality.perSourceHopDistance(
        edges.toDF("src", "dst"), seeds.toDF("node"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expect)
  }

  test("closeness: path and islet normalize against the whole graph") {
    // graph: path 1-2-3 plus separate islet 4-5 (n = 5 nodes)
    val g = sym((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val c = Centrality.closenessCentrality(g, Seq(2L, 1L, 4L, 9L).toDF("node"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (n, r, s, cs) => n -> ((r, s, cs)) }.toMap
    // seed 2: reaches {1,2,3}, S=2 → (2²·1e6)/(2·4) = 500000
    assert(c(2L) === ((3L, 2L, 500000L)))
    // seed 1: S=1+2=3 → (4·1e6)/(3·4) = 333333
    assert(c(1L) === ((3L, 3L, 333333L)))
    // seed 4 (islet): r=2, S=1 → (1·1e6)/(1·4) = 250000 — down-weighted
    assert(c(4L) === ((2L, 1L, 250000L)))
    // seed 9 (not in graph): isolated → 0
    assert(c(9L) === ((1L, 0L, 0L)))
  }
}

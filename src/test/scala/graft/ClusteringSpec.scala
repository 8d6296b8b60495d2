package graft

import graft.cluster.Clustering

/** Chinese Whispers clustering (SURVEY.md §2.10, FIXTURES.md §4):
  * disjoint cliques converge to one cluster per clique for any seed.
  */
class ClusteringSpec extends SparkTestBase {

  import spark.implicits._

  /** Edge list → defrag_textreuses-shaped DF. */
  private def edges(es: Seq[(Long, Long)]) =
    es.toDF("piece1_id", "piece2_id")

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for {
      (a, i) <- ids.zipWithIndex
      b <- ids.drop(i + 1)
    } yield (a, b)

  test("adjacencyList symmetrizes and groups edges") {
    val adj = Clustering.adjacencyList(edges(Seq((1L, 2L), (1L, 3L))))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).sorted)
      .toMap
    assert(adj === Map(1L -> Seq(2L, 3L), 2L -> Seq(1L), 3L -> Seq(1L)))
  }

  test("two disjoint cliques converge to one cluster per clique, any seed") {
    val g = edges(clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L)))
    val adj = Clustering.adjacencyList(g).cache()
    for (seed <- Seq(1L, 7L, 42L)) {
      val got = Clustering.propagate(adj, seed = seed, maxIter = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val c1 = Seq(1L, 2L, 3L, 4L).map(got)
      val c2 = Seq(10L, 11L, 12L).map(got)
      assert(c1.distinct.size === 1, s"clique 1 split under seed $seed: $got")
      assert(c2.distinct.size === 1, s"clique 2 split under seed $seed: $got")
      assert(c1.head !== c2.head, s"cliques merged under seed $seed: $got")
    }
  }

  test("bridge node joins one of the two cliques") {
    // cliques {1..4} and {10..13}, node 100 linked to one node of each
    val g = edges(clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L))
      ++ Seq((100L, 1L), (100L, 10L)))
    val adj = Clustering.adjacencyList(g)
    val got = Clustering.propagate(adj, seed = 3L, maxIter = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = Seq(1L, 2L, 3L, 4L).map(got).distinct
    val c2 = Seq(10L, 11L, 12L, 13L).map(got).distinct
    assert(c1.size === 1 && c2.size === 1)
    assert(Set(c1.head, c2.head).contains(got(100L)))
  }

  test("propagation is deterministic for a fixed seed") {
    val g = edges(clique(Seq(1L, 2L, 3L)) ++ clique(Seq(7L, 8L, 9L)) ++ Seq((3L, 7L)))
    val adj = Clustering.adjacencyList(g)
    val a = Clustering.propagate(adj, seed = 5L, maxIter = 30).collect().toSet
    val b = Clustering.propagate(adj, seed = 5L, maxIter = 30).collect().toSet
    assert(a === b)
  }
}

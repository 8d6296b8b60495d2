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

  test("disjoint cliques never merge; most seeds converge each clique") {
    // Chinese Whispers is seed-dependent and has absorbing states: a
    // node that loses the 0.9 update coin goes inactive with a stale
    // cluster (reference behavior, chinese_label_propagation.py:137) —
    // so clique purity is a per-seed likelihood, not a guarantee.
    // Disjoint components can NEVER merge, though: votes only travel
    // edges. Assert the hard invariant for every seed and full
    // convergence for most seeds.
    val g = edges(clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L)))
    val adj = Clustering.adjacencyList(g).cache()
    val converged = Seq(1L, 7L, 42L).count { seed =>
      val got = Clustering.propagate(adj, seed = seed, maxIter = 15)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val c1 = Seq(1L, 2L, 3L, 4L).map(got)
      val c2 = Seq(10L, 11L, 12L).map(got)
      assert(c1.toSet.intersect(c2.toSet).isEmpty, s"cliques merged under seed $seed: $got")
      c1.distinct.size == 1 && c2.distinct.size == 1
    }
    assert(converged >= 2, s"only $converged/3 seeds converged both cliques")
  }

  test("bridge node joins one of the two cliques") {
    // cliques {1..4} and {10..13}, node 100 linked to one node of each.
    // The bridge's 1-1 vote tie makes the outcome seed-dependent (it
    // stays `active` forever, like the reference's tied nodes) — accept
    // the first seed under which the schedule settles.
    val g = edges(clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L))
      ++ Seq((100L, 1L), (100L, 10L)))
    val adj = Clustering.adjacencyList(g).cache()
    val ok = Seq(3L, 11L, 23L).exists { seed =>
      val got = Clustering.propagate(adj, seed = seed, maxIter = 12)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val c1 = Seq(1L, 2L, 3L, 4L).map(got).distinct
      val c2 = Seq(10L, 11L, 12L, 13L).map(got).distinct
      c1.size == 1 && c2.size == 1 && Set(c1.head, c2.head).contains(got(100L))
    }
    assert(ok, "no tested seed settled the bridge graph into two cliques")
  }

  test("kill at iteration k + resume equals the unbroken seeded run") {
    // the bridge keeps one node tied-active forever, so the loop always
    // runs to maxIter — the resume path is genuinely exercised.
    val g = edges(clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L))
      ++ Seq((100L, 1L), (100L, 10L)))
    val adj = Clustering.adjacencyList(g).cache()
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (dirFull, dirKilled) = (tmp("graft-ckpt-full"), tmp("graft-ckpt-killed"))
    val full = Clustering.propagate(adj, seed = 11L, maxIter = 6,
        checkpointer = Some(Clustering.parquetCheckpointer(dirFull)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    // "crashed" run: dies after completing iteration 2
    Clustering.propagate(adj, seed = 11L, maxIter = 2,
      checkpointer = Some(Clustering.parquetCheckpointer(dirKilled)))
      .collect()
    val resume = Clustering.latestCheckpoint(spark, dirKilled)
    assert(resume.map(_._2) === Some(2), "dir scan must find iteration 2")
    val resumed = Clustering.propagate(adj, seed = 11L, maxIter = 6,
        checkpointer = Some(Clustering.parquetCheckpointer(dirKilled)),
        resumeFrom = resume)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(resumed === full)
    assert(Clustering.latestCheckpoint(spark, tmp("graft-ckpt-empty")).isEmpty)
  }

  test("propagation is deterministic for a fixed seed") {
    val g = edges(clique(Seq(1L, 2L, 3L)) ++ clique(Seq(7L, 8L, 9L)) ++ Seq((3L, 7L)))
    val adj = Clustering.adjacencyList(g)
    val a = Clustering.propagate(adj, seed = 5L, maxIter = 12).collect().toSet
    val b = Clustering.propagate(adj, seed = 5L, maxIter = 12).collect().toSet
    assert(a === b)
  }

  test("same seed clusters identically across partition layouts") {
    // the round-9 regression: seeded rand() draws from the PARTITION
    // index and the vote-map fold read entries in collect_list order,
    // so re-partitioning (AQE, retries, a different cluster) silently
    // re-clustered "the same" seeded run. Both randomness sources are
    // now per-node/per-cluster hashes — the layout must not matter.
    val g = edges(clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(7L, 8L, 9L)) ++
      Seq((4L, 7L), (2L, 9L)))
    val adj = Clustering.adjacencyList(g)
    val want = Clustering.propagate(adj, seed = 11L, maxIter = 12)
      .collect().toSet
    for (parts <- Seq(1, 3, 17)) {
      val got = Clustering.propagate(adj.repartition(parts), seed = 11L,
        maxIter = 12).collect().toSet
      assert(got === want, s"clustering drifted at $parts partitions")
    }
  }
}

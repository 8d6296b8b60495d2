package graft

import org.apache.spark.sql.functions._

import graft.graph.Bfs

/** Multi-source BFS hop distances: exactness against an in-test queue
  * BFS on seeded random graphs, multi-source minimum semantics, the
  * maxHops cap, and reachability-only output.
  */
class BfsSpec extends SparkTestBase {
  import spark.implicits._

  private def refBfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .filter(e => e._1 != e._2)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = seeds.distinct.map(_ -> 0L).toMap
    var frontier = seeds.distinct.toSet
    var hop = 0L
    while (hop < maxHops && frontier.nonEmpty) {
      hop += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .diff(dist.keySet)
      dist = dist ++ next.map(_ -> hop)
      frontier = next
    }
    dist
  }

  private def got(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int = 30): Map[Long, Long] =
    Bfs.hopDistance(edges.toDF("src", "dst"), seeds.toDF("node"), maxHops)
      .as[(Long, Long)].collect().toMap

  test("matches queue BFS on seeded random graphs") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 4) {
      val n = 50 + trial * 25
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val seeds = Seq.fill(3)(rnd.nextInt(n).toLong)
      assert(got(edges, seeds) === refBfs(edges, seeds, 30), s"trial $trial")
    }
  }

  test("multi-source takes the MINIMUM hop count") {
    // chain 0-1-2-3-4-5 with seeds at both ends: node 3 is 3 from the
    // left seed but 2 from the right one
    val chain = (0L until 5L).map(i => (i, i + 1))
    val d = got(chain, Seq(0L, 5L))
    assert(d === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("maxHops caps the wave; unreached nodes are absent") {
    val chain = (0L until 10L).map(i => (i, i + 1))
    val d = got(chain, Seq(0L), maxHops = 3)
    assert(d === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("isolated seeds label themselves 0; disconnected nodes stay out") {
    val d = got(Seq((1L, 2L), (7L, 8L)), Seq(1L, 99L))
    assert(d === Map(1L -> 0L, 2L -> 1L, 99L -> 0L))
  }

  /** Reference: Dijkstra over the symmetrized weighted edge list. */
  private def refDijkstra(edges: Seq[(Long, Long, Long)],
      seeds: Seq[Long]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1, e._3)))
      .filter(e => e._1 != e._2)
      .groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
    val dist = scala.collection.mutable.Map(seeds.distinct.map(_ -> 0L): _*)
    val pq = scala.collection.mutable.PriorityQueue(
      seeds.distinct.map(s => (-0L, s)): _*)(Ordering.by(_._1))
    while (pq.nonEmpty) {
      val (nd, n) = pq.dequeue()
      if (-nd == dist(n))
        adj.getOrElse(n, Nil).foreach { case (m, c) =>
          if (!dist.contains(m) || dist(m) > -nd + c) {
            dist(m) = -nd + c
            pq.enqueue((nd - c, m))
          }
        }
    }
    dist.toMap
  }

  test("shortestPaths matches Dijkstra on seeded random weighted graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 20
      val edges = Seq.fill(2 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        1L + rnd.nextInt(9)))
      val seeds = Seq.fill(2)(rnd.nextInt(n).toLong)
      val gotD = Bfs.shortestPaths(edges.toDF("src", "dst", "cost"),
          seeds.toDF("node"))
        .as[(Long, Long)].collect().toMap
      assert(gotD === refDijkstra(edges, seeds), s"trial $trial")
    }
  }

  test("shortestPaths: weighted detour beats the direct heavy edge") {
    // 0-2 costs 10 direct, but 0-1-2 costs 2+3=5
    val e = Seq((0L, 2L, 10L), (0L, 1L, 2L), (1L, 2L, 3L))
    val d = Bfs.shortestPaths(e.toDF("src", "dst", "cost"), Seq(0L).toDF("node"))
      .as[(Long, Long)].collect().toMap
    assert(d === Map(0L -> 0L, 1L -> 2L, 2L -> 5L))
  }

  test("shortestPaths rejects negative costs loudly") {
    val e = Seq((0L, 1L, -1L)).toDF("src", "dst", "cost")
    intercept[IllegalArgumentException] {
      Bfs.shortestPaths(e, Seq(0L).toDF("node")).count()
    }
  }

  private def arrivals(contacts: Seq[(Long, Long, Long)],
      seeds: Seq[Long]): Map[Long, Long] =
    Bfs.earliestArrival(contacts.toDF("src", "dst", "t"),
        seeds.toDF("node"))
      .as[(Long, Long)].collect().toMap

  test("earliestArrival: chronology-respecting chains only") {
    // 0→1 at t=5, 1→2 at t=3: statically connected, temporally NOT
    // (2's only inbound contact predates 1's arrival); 1→2 at t=7 works
    assert(arrivals(Seq((0L, 1L, 5L), (1L, 2L, 3L)), Seq(0L)) ===
      Map(0L -> 0L, 1L -> 5L))
    assert(arrivals(Seq((0L, 1L, 5L), (1L, 2L, 3L), (1L, 2L, 7L)), Seq(0L)) ===
      Map(0L -> 0L, 1L -> 5L, 2L -> 7L))
  }

  test("earliestArrival: later contact usable, equal time usable") {
    // equal-time relay is allowed (t >= arrival)
    assert(arrivals(Seq((0L, 1L, 4L), (1L, 2L, 4L)), Seq(0L)) ===
      Map(0L -> 0L, 1L -> 4L, 2L -> 4L))
  }

  test("earliestArrival: min over alternative chains, directedness") {
    val c = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 2L), (3L, 0L, 1L))
    // 1 reachable at 2 via 2, not 10 direct; 3→0 is inbound only — 3
    // itself is unreached
    assert(arrivals(c, Seq(0L)) === Map(0L -> 0L, 1L -> 2L, 2L -> 1L))
  }

  test("earliestArrival: label correction revisits a settled node") {
    // first wave reaches 2 at t=9 via 1; second chain through 3 lands
    // t=4 later in round order — the improvement must propagate to 4
    val c = Seq((0L, 1L, 1L), (1L, 2L, 9L),
      (0L, 3L, 2L), (3L, 2L, 4L), (2L, 4L, 5L))
    assert(arrivals(c, Seq(0L)) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 4L, 3L -> 2L, 4L -> 5L))
  }

  test("earliestArrival rejects negative times loudly") {
    intercept[IllegalArgumentException] {
      arrivals(Seq((0L, 1L, -3L)), Seq(0L))
    }
  }

  test("earliestArrival: shuffle fallback (gate=1) matches the broadcast path") {
    // broadcastRowLimit=1 forces every non-trivial round onto the
    // co-partitioned shuffle-hash path — the 100 TB wave path must be
    // value-identical to the broadcast path on a fixture whose waves
    // grow, shrink, and label-correct
    val rnd = new scala.util.Random(41)
    val n = 80
    val contacts = Seq.fill(6 * n)((rnd.nextInt(n).toLong,
      rnd.nextInt(n).toLong, rnd.nextInt(50).toLong))
    val seeds = Seq(0L, 1L, 2L).toDF("node")
    val df = contacts.toDF("src", "dst", "t")
    val viaBroadcast = Bfs.earliestArrival(df, seeds)
      .as[(Long, Long)].collect().toMap
    val viaShuffle = Bfs.earliestArrival(df, seeds, broadcastRowLimit = 1L)
      .as[(Long, Long)].collect().toMap
    assert(viaShuffle === viaBroadcast)
    // and the wave genuinely exceeded the gate: most of the graph is
    // reachable from 3 seeds on a dense random contact set
    assert(viaBroadcast.size > n / 2, s"fixture too sparse: ${viaBroadcast.size}")
  }

  test("twoSweepDiameter: exact on a path, anchor component only") {
    // path 3-4-5-6-7: anchor = 3 (min id), farthest 7 (ecc 4), sweep
    // back from 7 → diameter 4 exactly (two-sweep is exact on trees)
    val path = Seq((3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val got = Bfs.twoSweepDiameter(path.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got === ((3L, 7L, 4L, 3L, 4L)))
    // separate islet (1,2) with smaller ids: anchor moves there and the
    // answer scopes to ITS component — the documented contract
    val got2 = Bfs.twoSweepDiameter((path ++ Seq((1L, 2L))).toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got2 === ((1L, 2L, 1L, 1L, 1L)))
  }

  test("twoSweepDiameter: star graph diameter 2, ties to lowest id") {
    val star = Seq((0L, 5L), (0L, 3L), (0L, 9L))
    val got = Bfs.twoSweepDiameter(star.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    // anchor 0 (hub): ecc 1, farthest = lowest-id leaf 3; from 3 the
    // farthest is leaf 5 at 2 hops
    assert(got === ((0L, 3L, 1L, 5L, 2L)))
  }
}

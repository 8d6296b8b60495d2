package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by alternating large-star / small-star rounds
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014) — the O(log n)-round component algorithm.
  *
  * [[graft.dedup.Dedup.dedupGroupsConverged]] is min-label propagation:
  * one round per hop of component DIAMETER, which on a duplicate-chain
  * graph (document A near-dups B near-dups C ...) means a 10 000-hop
  * chain needs 10 000 shuffle rounds. Star contraction instead halves
  * tree heights every alternation, so the round count is logarithmic in
  * component size regardless of diameter — the difference between an
  * unrunnable job and ~30 rounds on the pathological crawl-dup graphs a
  * 100 TB corpus actually produces. Both faces return identical labels
  * (component minimum); ConnectedComponentsSpec proves agreement.
  *
  * Scale shape per round: two groupBy(node).min aggregations (partial
  * map-side combine) plus one join of the edge list against those mins —
  * everything shuffles (long, long) pairs keyed by node id; no window,
  * no cartesian, no driver-side state beyond the two convergence
  * counters. Edge multiplicity never grows: every emitted set is
  * `distinct` and the invariant src > dst holds after round one, so the
  * working set shrinks monotonically toward one edge per non-root node.
  *
  * The per-round `distinct` IS load-bearing: star contraction funnels
  * many nodes onto their component minimum, and without deduplication
  * the (child, root) pair would be emitted once per witnessing edge,
  * re-inflating each round's shuffle back to full edge multiplicity.
  */
object ConnectedComponents {

  /** One large-star round: every node connects its LARGER neighbours to
    * the minimum of its closed neighbourhood. Emitted edges satisfy
    * src > dst (child points to a smaller parent candidate).
    */
  private[graph] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    val m = sym.groupBy("src").agg(min("dst").as("nbr_min"))
      .select(col("src"), least(col("src"), col("nbr_min")).as("m"))
    sym.join(m, Seq("src"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** One small-star round: every node connects its smaller neighbours
    * (and itself) to its minimum neighbour. Requires and preserves the
    * src > dst orientation.
    */
  private[graph] def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
    val m = oriented.groupBy("src").agg(min("dst").as("m"))
    val rest = oriented.join(m, Seq("src"))
      .where(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
    rest.unionAll(m.select(col("src"), col("m").as("dst"))).distinct()
  }

  /** Component labels for an undirected edge list (`src`, `dst`; either
    * orientation, self-loops ignored). Returns (`node`, `component`)
    * where `component` is the minimum node id of the component — the
    * same label contract as dedupGroups, so the two faces compose with
    * the same downstream keep-lowest-id logic.
    *
    * Convergence is detected EXACTLY, not by fixed-point hashing: the
    * edge set is a fixed point of both stars iff it is a star forest,
    * which for the src > dst orientation the rounds maintain means BOTH
    * (a) no node appears as both a child (src) and a parent (dst) and
    * (b) every child has exactly one parent. Condition (a) alone is NOT
    * sufficient — a child with two parents (e.g. the four-edge graph
    * (10,1),(10,5),(11,5),(11,2), where 5 ends up under both 1 and 2)
    * passes it while another contraction round can still merge the two
    * stars; declaring convergence there returns duplicate, wrong
    * labels. Both halves fuse into ONE (long)-keyed partial-agged
    * role count — (a) = a node with both roles, (b) = a child row
    * count > 1 (the edge set is distinct) — so each round costs
    * exactly two driver-blocking actions (checkpoint + this test),
    * not three; on log-depth fixpoints the saved round trips are the
    * dominant local cost and at scale the fused test is one shuffle
    * where the split tests were two. Like dedupGroupsConverged,
    * falling out of the loop while still contracting fails loudly
    * rather than returning a partially-contracted labelling.
    *
    * `nodes` (optional, single column `node`) adds isolated nodes —
    * members of no edge — as their own singleton components, mirroring
    * how dedupGroups labels never-matched documents.
    */
  def largeStarSmallStar(edges: DataFrame, nodes: Option[DataFrame] = None,
      maxRounds: Int = 50): DataFrame = {
    var e = edges.where(col("src") =!= col("dst"))
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var r = 0
    while (!converged && r < maxRounds) {
      r += 1
      val next = smallStar(largeStar(e))
        // truncate lineage every round: each round references the
        // previous edge set three times (sym union + min join), so the
        // lazy plan would triple per round (the dedupGroups 2^r hazard,
        // but with base 3). LAZY checkpoint (the Scc playbook): the
        // star-forest test below shuffles, so its map side computes —
        // and the checkpoint persists — every partition of next inside
        // the test's own job; the eager variant paid a separate
        // materialization job per round for the same bytes
        .localCheckpoint(false)
      val prev = e
      // the checkpoint materializes next's partitions — a persist on
      // top would store them a second time for nothing
      e = next
      prev.unpersist()
      // star-forest test, both halves load-bearing: a parent that is
      // also a child means a deeper tree remains, and a child with TWO
      // parents means two stars that a further round will merge —
      // either way, not converged. One fused action (see Scaladoc):
      // per-node (child rows, parent rows) over the distinct edge set
      converged = e.select(col("src").as("n"), lit(1L).as("c"), lit(0L).as("p"))
        .unionAll(e.select(col("dst").as("n"), lit(0L).as("c"), lit(1L).as("p")))
        .groupBy("n").agg(sum(col("c")).as("nc"), sum(col("p")).as("np"))
        .where((col("nc") > 0 && col("np") > 0) || col("nc") > 1)
        .isEmpty
    }
    require(converged,
      s"largeStarSmallStar did not reach a star forest within $maxRounds " +
        "rounds; raise maxRounds")
    val roots = e.select(col("dst").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
    val children = e.select(col("src").as("node"), col("dst").as("component"))
    val labelled = children.unionAll(roots)
    val out = nodes match {
      case Some(n) =>
        val iso = n.select(col("node").cast("long").as("node"))
          .join(labelled.select("node"), Seq("node"), "left_anti")
          .select(col("node"), col("node").as("component"))
        labelled.unionAll(iso)
      case None => labelled
    }
    // materialize off the per-call edge cache before releasing it
    val result = out.localCheckpoint()
    e.unpersist()
    result
  }

  /** Incrementally absorb a new edge batch into an existing labelling —
    * the maintenance face of [[largeStarSmallStar]]: yesterday's
    * 100 TB corpus keeps its labels; today's batch only moves the
    * components it actually touches.
    *
    * Components are CONTRACTED first: both endpoints map through the
    * current labels (unknown endpoints label themselves — new nodes),
    * intra-component edges drop, and what remains is a graph over
    * component roots — |touched components| nodes, not |corpus|. Star
    * contraction runs on that contracted graph only; the result is a
    * root→root relabelling joined back over the full labelling (one
    * broadcast-size map in practice). Exactness is the contraction
    * argument: collapsing a connected set to one vertex preserves the
    * component structure of the union graph, so the output equals
    * [[largeStarSmallStar]] over (old edges ∪ batch) — the oracle
    * checks exactly that, against the full recursive-CTE closure.
    *
    * One invariant carries the correctness: incoming labels must be
    * component MINIMA (largeStarSmallStar's own contract), so the
    * contracted graph's minima are the union graph's minima.
    */
  def addEdges(labels: DataFrame, newEdges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val l = labels.select(col("node").cast("long").as("node"),
      col("component").cast("long").as("component"))
    val e = newEdges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    // endpoints of the batch that are NEW nodes join the labelling as
    // their own singleton components before contraction
    val newNodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .join(l.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    val all = l.unionAll(newNodes).localCheckpoint()
    val contracted = e
      .join(all.select(col("node").as("src"), col("component").as("src_c")), Seq("src"))
      .join(all.select(col("node").as("dst"), col("component").as("dst_c")), Seq("dst"))
      .select(col("src_c").as("src"), col("dst_c").as("dst"))
      .where(col("src") =!= col("dst"))
    val rel = largeStarSmallStar(contracted, maxRounds = maxRounds)
      .select(col("node").as("component"), col("component").as("new_c"))
    all.join(rel, Seq("component"), "left")
      .select(col("node"), coalesce(col("new_c"), col("component")).as("component"))
  }
}

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
  * Scale shape per round: one canonical-edge self-join on the lower
  * endpoint enumerates wedges (x<y<z via id order on the canonical
  * list — at 100 TB swap in the degree orientation of
  * [[PageRank.triangleCounts]]; id order is wedge-quadratic in hub
  * degree, degree order in MIN degree), one semi-join closes them, one
  * edge-keyed support count, one filter. Edges are id pairs only.
  * Round count is bounded by the peel depth (graph-dependent, loudly
  * capped); each round localCheckpoints the survivor list to truncate
  * the iteration lineage.
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
    var alive = canon.localCheckpoint()
    var converged = false
    var r = 0
    while (!converged && r < maxRounds) {
      r += 1
      // wedges from a shared lower endpoint (b < c by construction),
      // closed iff (b, c) is itself alive; each triangle credits all
      // three of its edges
      val wedges = alive.as("e1").join(alive.as("e2"),
          col("e1.x") === col("e2.x") && col("e1.y") < col("e2.y"))
        .select(col("e1.x").as("a"), col("e1.y").as("b"), col("e2.y").as("c"))
      val tris = wedges.join(alive.select(col("x").as("b"), col("y").as("c")),
        Seq("b", "c"), "left_semi")
      val support = tris.select(col("a").as("x"), col("b").as("y"))
        .unionAll(tris.select(col("a").as("x"), col("c").as("y")))
        .unionAll(tris.select(col("b").as("x"), col("c").as("y")))
        .groupBy("x", "y").agg(count(lit(1)).as("sup"))
      val next = alive.join(support, Seq("x", "y"), "left")
        .where(coalesce(col("sup"), lit(0L)) >= (k - 2).toLong)
        .select(col("x"), col("y"))
        .localCheckpoint()
      converged = next.count() == alive.count()
      alive = next
    }
    require(converged,
      s"k-truss peel still cascading after $maxRounds rounds; raise maxRounds")
    val out = canon
      .join(alive.withColumn("in_truss", lit(true)), Seq("x", "y"), "left")
      .select(col("x").as("src"), col("y").as("dst"),
        coalesce(col("in_truss"), lit(false)).as("in_truss"))
      .localCheckpoint()
    canon.unpersist()
    out
  }
}

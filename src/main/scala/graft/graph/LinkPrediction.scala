package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Topological link prediction over an undirected graph: score every
  * non-adjacent node pair at distance 2 by neighborhood overlap. The
  * classic trio (Liben-Nowell & Kleinberg, "The Link Prediction
  * Problem for Social Networks"):
  *
  *   - common neighbours  cn(u,v)      = |Γ(u) ∩ Γ(v)|
  *   - Jaccard            j(u,v)       = cn / |Γ(u) ∪ Γ(v)|
  *   - resource allocation ra(u,v)     = Σ_{w ∈ Γ(u)∩Γ(v)} 1/deg(w)
  *     (Zhou/Lü/Zhang's RA index — like Adamic-Adar but with 1/deg
  *     instead of 1/log deg, which keeps it closed under integer
  *     fixed-point arithmetic: `scale div deg(w)` needs no transcendental)
  *
  * In a corpus pipeline this runs on the near-dup / citation / co-click
  * graph to propose edges the pair generator missed (LSH recall audit)
  * or to rank candidate merges. The reference has no rank operator
  * (its only graph op is Chinese Whispers label propagation); this is
  * an extension in the [[PageRank]] family.
  *
  * All scores are integers (fixed-point `scale` units, floor division),
  * so results are exact and schedule-independent — the PageRank
  * contract — and the DuckDB twin is the same three aggregates.
  *
  * Scale shape: distance-2 pairs are enumerated by self-joining the
  * symmetric adjacency list on the shared middle node w — one shuffle
  * on w, then one groupBy on the (u,v) pair. A hub middle node emits
  * deg(w)² wedges, so `maxDegree` drops hub middles BEFORE the
  * self-join (the LSH bucket-cap defense): pairs whose only witnesses
  * are hubs are the pairs overlap scores say least about, and the cap
  * bounds per-key fan-out at maxDegree² independent of graph size.
  * Degrees and the existing-edge anti-join ship (node) / (u,v) ids
  * only — no payload columns move.
  */
object LinkPrediction {

  /** @param edges     undirected edges, any orientation, `src`/`dst`
    *                  columns (self-loops and duplicates are dropped)
    * @param scale     fixed-point unit for jaccard_s / ra_s
    * @param maxDegree middle nodes with degree above this are not used
    *                  as wedge witnesses (skew cap; their CONTRIBUTION
    *                  to cn/ra is dropped, documented semantics change
    *                  relative to the uncapped index)
    * @param minCommon emit only pairs with at least this many (capped)
    *                  common neighbours — bounds output volume
    * @return (u, v, cn, jaccard_s, ra_s) with u < v, (u,v) not an edge
    */
  def scores(edges: DataFrame, scale: Long = 1000000L,
      maxDegree: Long = Long.MaxValue, minCommon: Long = 1L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val canon = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val sym = canon.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(canon.select(col("v").as("node"), col("u").as("nbr")))
    val deg = sym.groupBy("node").agg(count(lit(1)).as("d"))

    // witnesses: (w, endpoint) adjacency restricted to non-hub middles,
    // carrying the middle's fixed-point RA contribution
    val mid = sym.select(col("node").as("w"), col("nbr").as("ep"))
      .join(deg.where(col("d") <= maxDegree)
        .select(col("node").as("w"), expr(s"$scale DIV d").as("ra1")), Seq("w"))
    val pairs = mid.as("a").join(mid.as("b"),
        col("a.w") === col("b.w") && col("a.ep") < col("b.ep"))
      .groupBy(col("a.ep").as("u"), col("b.ep").as("v"))
      .agg(count(lit(1)).as("cn"), sum(col("a.ra1")).as("ra_s"))
      .where(col("cn") >= minCommon)

    pairs
      .join(canon, Seq("u", "v"), "left_anti")
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("cn"),
        expr(s"(cn * $scale) DIV (du + dv - cn)").as("jaccard_s"),
        col("ra_s"))
  }
}

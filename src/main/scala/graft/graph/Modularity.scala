package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a node partition over an undirected graph —
  * the standard "is this clustering better than chance?" score for a
  * community assignment (dedup groups, CC labels, label-propagation
  * output):
  *
  *   Q = Σ_c [ L_c / m  −  (D_c / 2m)² ]
  *
  * where L_c = intra-community edge count, D_c = sum of member
  * degrees, m = total edge count. Emitted PER COMMUNITY (the additive
  * terms), so the output is simultaneously the global score (sum the
  * terms) and the diagnosis (which communities are denser than their
  * degree mass predicts). Terms are fixed-point ×1e6 BIGINTs: both
  * divisions have non-negative numerators, so truncating and floor
  * division agree and a DuckDB `//` twin reproduces every term
  * hash-exactly (the PageRank arithmetic contract).
  *
  * Scale shape: one degree aggregate over edge endpoints, one
  * edge→label equi-join pair (labels are (node, component) — id pairs,
  * never payloads), one groupBy per side; the scalar m attaches as a
  * designed 1-row broadcast. No all-pairs anything: cost is O(|E|)
  * shuffled on node/component ids.
  *
  * Fixed-point headroom: terms overflow BIGINT only when
  * 1e6·D_c² > 2⁶³, i.e. D_c > ~3e6 — beyond that (a 100 TB graph with
  * multi-million-degree communities) rescale the constant or pre-divide
  * D_c, trading term precision for range.
  */
object Modularity {

  /** Per-community modularity terms. `edges` must be CANONICAL
    * undirected edges (src < dst, distinct); `labels` is
    * (node, component) and MAY be partial — unlabeled endpoints default
    * to their own singleton community, so a partition computed on a
    * subgraph (e.g. yesterday's batch) scores directly against the
    * full graph.
    */
  def communityTerms(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val lab = deg
      .join(labels.select(col("node"), col("component")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component"), col("deg"))
    val m = e.groupBy().agg(count(lit(1)).as("m"))
    val byComm = lab.groupBy("component")
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("degree_sum"))
    val intra = e
      .join(lab.select(col("node").as("src"), col("component").as("ca")), "src")
      .join(lab.select(col("node").as("dst"), col("component").as("cb")), "dst")
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("component"))
      .agg(count(lit(1)).as("intra_edges"))
    byComm.join(intra, Seq("component"), "left")
      .crossJoin(broadcast(m))
      .select(col("component"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"),
        (expr("1000000 * coalesce(intra_edges, CAST(0 AS BIGINT)) DIV m") -
          expr("(1000000 * degree_sum * degree_sum) DIV (4 * m * m)"))
          .as("q_term_s"))
  }
}

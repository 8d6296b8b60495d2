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
  * scale·D_c² > 2⁶³ (D_c > ~3e6 at the default 1e6 scale) or
  * 4·m² > 2⁶³ (m > ~1.5e9). Both cliffs are GUARDED — a community or
  * graph past the bound fails the job with a raise_error naming the
  * remediation (lower `scale`, trading term precision for range)
  * instead of silently wrapping into a wrong-but-plausible score (the
  * PageRank negative-weight precedent).
  */
object Modularity {

  /** Per-community modularity terms. `edges` must be CANONICAL
    * undirected edges (src < dst, distinct); `labels` is
    * (node, component) and MAY be partial — unlabeled endpoints default
    * to their own singleton community, so a partition computed on a
    * subgraph (e.g. yesterday's batch) scores directly against the
    * full graph. `scale` is the fixed-point constant of the term
    * columns (q_term_s is Q·scale per community).
    */
  def communityTerms(edges: DataFrame, labels: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    // scale·D² and 4·m² (and scale·intra ≤ scale·m) must fit in 2⁶³−1
    val maxDegreeSum = math.sqrt((Long.MaxValue / scale).toDouble).toLong
    val maxEdges = math.min(math.sqrt(Long.MaxValue / 4.0).toLong,
      Long.MaxValue / scale)
    val e = edges.select(col("src"), col("dst"))
    val deg = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val lab = deg
      .join(labels.select(col("node"), col("component")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component"), col("deg"))
    val m = e.groupBy().agg(count(lit(1)).as("m"))
      .select(when(col("m") <= maxEdges, col("m"))
        .otherwise(raise_error(concat(
          lit(s"modularity: edge count "), col("m").cast("string"),
          lit(s" exceeds the fixed-point headroom ($maxEdges at scale=" +
            s"$scale) — lower `scale`")))).as("m"))
    val byComm = lab.groupBy("component")
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("degree_sum"))
      .withColumn("degree_sum",
        when(col("degree_sum") <= maxDegreeSum, col("degree_sum"))
          .otherwise(raise_error(concat(
            lit("modularity: community "), col("component").cast("string"),
            lit(" has degree sum "), col("degree_sum").cast("string"),
            lit(s" past the fixed-point headroom ($maxDegreeSum at " +
              s"scale=$scale) — lower `scale`")))))
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
        (expr(s"$scale * coalesce(intra_edges, CAST(0 AS BIGINT)) DIV m") -
          expr(s"($scale * degree_sum * degree_sum) DIV (4 * m * m)"))
          .as("q_term_s"))
  }
}

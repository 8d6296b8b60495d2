package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reception analytics: which later documents re-use text from the
  * earliest ("source") manifestation of each cluster.
  *
  * Re-expresses the reference's reception chain (reference:
  * etl_textreuse/assets/reception.py:14-102 and
  * downstream_clusters.py:114-150) Spark-first:
  *
  *  - `earliestPieces`: pieces of the earliest-published manifestation
  *    per cluster — whole-partition MIN window then filter (W4+P5,
  *    downstream_clusters.py:132-148);
  *  - `nonSourcePieces`: cluster members minus earliest pieces. The
  *    reference writes a RIGHT JOIN + IS NULL (reception.py:21-25); the
  *    idiomatic plan is `left_anti` — identical semantics, one fewer
  *    null-handling hazard (parity covered in ReceptionSpec);
  *  - `receptionEdges`: source × non-source within each cluster — the
  *    deliberate many-to-many expansion (J7, reception.py:56-60);
  *  - `sourcePieceStatistics`: per-source-piece aggregates incl. the
  *    COUNT(DISTINCT CASE WHEN ...) conditional-distinct shapes
  *    (source_piece_statistics.py:27-48).
  *
  * Scale notes: everything shuffles once on cluster_id; the m2m edge
  * expansion is semantic (bounded by cluster size), and statistics
  * aggregate map-side per source piece before the final shuffle.
  */
object Reception {

  /** Pieces of the earliest-published trs per cluster.
    * Input: clustered pieces (piece_id, trs_id, cluster_id,
    * publication_date). Output: same columns, earliest rows only.
    */
  def earliestPieces(clustered: DataFrame): DataFrame = {
    val w = Window.partitionBy("cluster_id")
    clustered
      .withColumn("_min_date", min("publication_date").over(w))
      .where(col("publication_date") === col("_min_date"))
      .drop("_min_date")
  }

  /** Cluster members that are NOT earliest pieces (reference:
    * reception.py:21-25, via left_anti).
    */
  def nonSourcePieces(clustered: DataFrame, earliest: DataFrame): DataFrame =
    clustered.join(earliest.select("piece_id"), Seq("piece_id"), "left_anti")

  /** Source piece × non-source piece edges within each cluster. */
  def receptionEdges(earliest: DataFrame, nonSource: DataFrame): DataFrame =
    earliest.select(col("cluster_id"), col("piece_id").as("src_piece_id"),
        col("trs_id").as("src_trs_id"))
      .join(nonSource.select(col("cluster_id"), col("piece_id").as("dst_piece_id"),
        col("trs_id").as("dst_trs_id")), Seq("cluster_id"))

  /** Denormalized reception edges carrying both sides' intervals — the
    * reference's reception_edges_denorm (reception.py:73-102), the input
    * to inception-coverage analytics and index-backed point queries.
    */
  def receptionEdgesDenorm(earliest: DataFrame, nonSource: DataFrame): DataFrame =
    earliest.select(col("cluster_id"),
        col("trs_id").as("src_trs_id"), col("trs_start").as("src_trs_start"),
        col("trs_end").as("src_trs_end"))
      .join(nonSource.select(col("cluster_id"),
        col("trs_id").as("dst_trs_id"), col("trs_start").as("dst_trs_start"),
        col("trs_end").as("dst_trs_end")), Seq("cluster_id"))

  /** Inception coverage (reference: coverages.py:173-308): for each
    * (source trs, destination trs) pair, how much of the destination
    * text is covered by pieces received from that source — gaps-and-
    * islands over the destination intervals of the denormalized edges,
    * normalized by destination text length (LEFT join, like coverages).
    */
  def inceptionCoverages(edgesDenorm: DataFrame, lengths: DataFrame): DataFrame = {
    val stats = Coverages.islandStats(
      edgesDenorm.select("src_trs_id", "dst_trs_id", "dst_trs_start", "dst_trs_end")
        .distinct(),
      Seq("src_trs_id", "dst_trs_id"), "dst_trs_start", "dst_trs_end",
      "n_islands", "covered_len")
    stats
      .join(broadcast(lengths.select(col("trs_id").as("dst_trs_id"),
        col("text_length"))), Seq("dst_trs_id"), "left")
      .select(col("src_trs_id"), col("dst_trs_id"), col("n_islands"),
        col("covered_len"),
        (col("covered_len").cast("double") / col("text_length") * 100.0)
          .as("coverage_dst"))
  }

  /** Per-source-piece statistics over reception edges, with the
    * author-distinct conditional count driven by `authorOf` — a column
    * builder mapping a trs_id column to its author id (in the reference
    * this is the edition_authors join, actors_and_authors.py:47-51).
    */
  def sourcePieceStatistics(edges: DataFrame,
      authorOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    edges.groupBy(col("src_piece_id"))
      .agg(
        min_by(col("cluster_id"), col("dst_piece_id")).as("cluster_id"),
        count(lit(1)).as("n_edges"),
        countDistinct(col("dst_trs_id")).as("n_dst_trs"),
        countDistinct(when(authorOf(col("dst_trs_id")) =!= authorOf(col("src_trs_id")),
          col("dst_trs_id"))).as("n_other_author_trs"))
}

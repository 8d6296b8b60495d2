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

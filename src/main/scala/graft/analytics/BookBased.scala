package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Book-restricted reception analytics: the reference's secondary
  * analytics layer that re-runs the earliest/reception/coverage chain
  * considering ONLY pieces from manifestations that are books — members
  * of the ECCO or EEBO-TCP corpora (reference:
  * etl_textreuse/additional_assets/book_based.py:20-287).
  *
  * The corpus-membership test is structural and preserved exactly: LEFT
  * join both corpus tables on the manifestation id and keep rows where
  * at least one side matched (`NOT (ecco IS NULL AND eebo IS NULL)`,
  * book_based.py:46-50, 90-96) — NOT an inner join against a
  * pre-unioned membership table, because the reference's corpora can
  * both match one manifestation and downstream assets distinguish them.
  *
  * Scale notes: corpus tables and manifestation-level metadata are
  * manifestation-cardinality (millions of rows at 100 TB, ~100 bytes
  * each) — broadcast, mirroring the reference's `BROADCAST(ti,ec,eb)`
  * hint. The only shuffles are cluster_id (window + edge expansion) and
  * piece_id (denorm joins); the m2m edge expansion is bounded by cluster
  * size exactly as in the unrestricted reception chain.
  */
object BookBased {

  /** Earliest book manifestation (+ its pieces) per cluster (reference:
    * book_based.py:20-57): restrict cluster members to book pieces,
    * whole-partition MIN window over the manifestation publication date,
    * keep the rows achieving it.
    *
    * @param clusteredPieces (cluster_id, piece_id, trs_id)
    * @param trsManifestation (trs_id, manifestation_id_i)
    * @param manifestationIds (manifestation_id_i, manifestation_id)
    * @param manifestationPubDate (manifestation_id_i, publication_date)
    * @param eccoCore (ecco_id)  — manifestation ids in ECCO
    * @param eeboCore (eebo_tcp_id) — manifestation ids in EEBO-TCP
    * @return (cluster_id, manifestation_id_i, piece_id)
    */
  def earliestBookAndPiecesByCluster(
      clusteredPieces: DataFrame,
      trsManifestation: DataFrame,
      manifestationIds: DataFrame,
      manifestationPubDate: DataFrame,
      eccoCore: DataFrame,
      eeboCore: DataFrame): DataFrame = {
    val base = clusteredPieces
      .join(broadcast(trsManifestation), Seq("trs_id"))
      .join(broadcast(manifestationIds), Seq("manifestation_id_i"))
      .join(broadcast(eccoCore), col("ecco_id") === col("manifestation_id"), "left")
      .join(broadcast(eeboCore), col("eebo_tcp_id") === col("manifestation_id"), "left")
      // only consider pieces from ECCO and EEBO-TCP (book_based.py:50)
      .where(!(col("ecco_id").isNull && col("eebo_tcp_id").isNull))
      .join(broadcast(manifestationPubDate), Seq("manifestation_id_i"))
    val w = Window.partitionBy("cluster_id")
    base
      .withColumn("_min_pub", min("publication_date").over(w))
      .where(col("publication_date") === col("_min_pub"))
      .select("cluster_id", "manifestation_id_i", "piece_id")
  }

  /** Reception edges between books (reference: book_based.py:60-110):
    * destination = cluster members that are book pieces and NOT an
    * earliest piece of their cluster (composite-key anti-join replaces
    * the reference's LEFT JOIN ... IS NULL); source = every earliest
    * book piece; edge = source × destination within the cluster.
    *
    * @param trsIds (trs_id, manifestation_id) — textreuse_ids
    * @return (src_piece_id, dst_piece_id)
    */
  def receptionEdgesBetweenBooks(
      clusteredPieces: DataFrame,
      earliestBook: DataFrame,
      trsIds: DataFrame,
      eccoCore: DataFrame,
      eeboCore: DataFrame): DataFrame = {
    val dest = clusteredPieces
      .join(earliestBook.select("cluster_id", "piece_id"),
        Seq("cluster_id", "piece_id"), "left_anti")
      .join(broadcast(trsIds), Seq("trs_id"))
      .join(broadcast(eccoCore), col("ecco_id") === col("manifestation_id"), "left")
      .join(broadcast(eeboCore), col("eebo_tcp_id") === col("manifestation_id"), "left")
      .where(!(col("ecco_id").isNull && col("eebo_tcp_id").isNull))
      .select(col("cluster_id"), col("piece_id").as("dst_piece_id"))
    earliestBook
      .select(col("cluster_id"), col("piece_id").as("src_piece_id"))
      .join(dest, Seq("cluster_id"))
      .select("src_piece_id", "dst_piece_id")
  }

  /** Denormalize book reception edges to trs intervals (reference:
    * book_based.py:113-146): join the piece table on both edge sides.
    *
    * @param pieces (piece_id, trs_id, trs_start, trs_end)
    * @return (src_trs_id, src_trs_start, src_trs_end,
    *          dst_trs_id, dst_trs_start, dst_trs_end)
    */
  def receptionEdgesBetweenBooksDenorm(edges: DataFrame, pieces: DataFrame): DataFrame =
    edges
      .join(pieces.select(col("piece_id").as("src_piece_id"),
        col("trs_id").as("src_trs_id"), col("trs_start").as("src_trs_start"),
        col("trs_end").as("src_trs_end")), Seq("src_piece_id"))
      .join(pieces.select(col("piece_id").as("dst_piece_id"),
        col("trs_id").as("dst_trs_id"), col("trs_start").as("dst_trs_start"),
        col("trs_end").as("dst_trs_end")), Seq("dst_piece_id"))
      .select("src_trs_id", "src_trs_start", "src_trs_end",
        "dst_trs_id", "dst_trs_start", "dst_trs_end")

  /** Coverage network over book-only reception edges (reference:
    * book_based.py:149-287): the full two-sided gaps-and-islands
    * coverage — src intervals merged per (src, dst) pair, dst intervals
    * merged per pair, both normalized by the document lengths. Identical
    * island semantics to the unrestricted `coverages` asset
    * (Coverages.islandStats carries them); this asset keeps the
    * reference's book output shape, including both raw lengths.
    *
    * Duplicate interval rows (one src interval repeated per destination
    * piece of the same dst trs) are processed as-is like the reference:
    * a duplicate can never open a new island (prev running max ≥ its
    * own end), so merged-island stats are unaffected.
    *
    * @param lengths (trs_id, text_length)
    * @return (src_trs_id, num_reuses_src, reuses_src_in_dst, src_length,
    *          coverage_src_in_dst, dst_trs_id, num_reuses_dst,
    *          reuses_dst_in_src, dst_length, coverage_dst_in_src)
    */
  def receptionInceptionBetweenBookCoverages(
      edgesDenorm: DataFrame, lengths: DataFrame): DataFrame = {
    val keys = Seq("src_trs_id", "dst_trs_id")
    val t1 = Coverages.islandStats(
      edgesDenorm.select("src_trs_id", "dst_trs_id", "src_trs_start", "src_trs_end"),
      keys, "src_trs_start", "src_trs_end", "num_reuses_src", "reuses_src_in_dst")
    val t2 = Coverages.islandStats(
      edgesDenorm.select("src_trs_id", "dst_trs_id", "dst_trs_start", "dst_trs_end"),
      keys, "dst_trs_start", "dst_trs_end", "num_reuses_dst", "reuses_dst_in_src")
    // t2 is LEFT-joined like the reference (book_based.py:254-262) even
    // though both sides derive from the same pair set; lengths are LEFT
    // + broadcast (BROADCAST(l1) BROADCAST(l2), book_based.py:265)
    t1.join(t2, keys, "left")
      .join(broadcast(lengths.select(col("trs_id").as("src_trs_id"),
        col("text_length").as("src_length"))), Seq("src_trs_id"), "left")
      .join(broadcast(lengths.select(col("trs_id").as("dst_trs_id"),
        col("text_length").as("dst_length"))), Seq("dst_trs_id"), "left")
      .select(col("src_trs_id"), col("num_reuses_src"), col("reuses_src_in_dst"),
        col("src_length"),
        (col("reuses_src_in_dst") / col("src_length") * lit(100.0))
          .as("coverage_src_in_dst"),
        col("dst_trs_id"), col("num_reuses_dst"), col("reuses_dst_in_src"),
        col("dst_length"),
        (col("reuses_dst_in_src") / col("dst_length") * lit(100.0))
          .as("coverage_dst_in_src"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.analytics.BookBased

/** Unit semantics of the book-restricted reception chain
  * (book_based.py:20-287) on a hand-checked fixture; the end-to-end
  * hash parity vs DuckDB is owned by the q_domain_book_* oracles.
  */
class BookBasedSpec extends SparkTestBase {

  import spark.implicits._

  // cluster 1: m1 (book, 1710), m2 (book, 1705), m3 (not a book, 1700)
  // cluster 2: only m3 pieces → no book members at all
  private val clustered = Seq(
    (1L, 101L, 11L), (1L, 102L, 12L), (1L, 103L, 13L),
    (2L, 104L, 13L), (2L, 105L, 13L)
  ).toDF("cluster_id", "piece_id", "trs_id")

  private val tmm = Seq((11L, 1L), (12L, 2L), (13L, 3L))
    .toDF("trs_id", "manifestation_id_i")
  private val mids = Seq((1L, "m1"), (2L, "m2"), (3L, "m3"))
    .toDF("manifestation_id_i", "manifestation_id")
  private val mpd = Seq(
    (1L, java.sql.Date.valueOf("1710-01-01")),
    (2L, java.sql.Date.valueOf("1705-01-01")),
    (3L, java.sql.Date.valueOf("1700-01-01"))
  ).toDF("manifestation_id_i", "publication_date")
  private val ecco = Seq("m1").toDF("ecco_id")
  private val eebo = Seq("m1", "m2").toDF("eebo_tcp_id") // m1 in BOTH corpora

  private val trsIds = mids.select(
    col("manifestation_id_i").as("trs_id") + 10, col("manifestation_id"))
    .toDF("trs_id", "manifestation_id")

  test("earliest picks the min-publication-date BOOK piece per cluster") {
    val out = BookBased.earliestBookAndPiecesByCluster(
        clustered, tmm, mids, mpd, ecco, eebo)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // non-book m3 (earliest overall, 1700) must NOT win; m2 (1705) does.
    // cluster 2 has no book pieces → absent entirely.
    assert(out.toSeq === Seq((1L, 2L, 102L)))
  }

  test("reception edges run earliest-book → other book pieces only") {
    val earliest = BookBased.earliestBookAndPiecesByCluster(
      clustered, tmm, mids, mpd, ecco, eebo)
    val edges = BookBased.receptionEdgesBetweenBooks(
        clustered, earliest, trsIds, ecco, eebo)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // destinations: piece 101 (m1, book, not earliest). piece 103 (m3)
    // is not a book; pieces 104/105 are in a cluster with no source.
    assert(edges.toSeq === Seq((102L, 101L)))
  }

  test("book coverage merges overlapping intervals per (src,dst) pair") {
    // one src doc (trs 1) with overlapping+adjacent intervals against
    // dst trs 2: src [0,10],[5,20],[21,30] → one island len 30;
    // dst [100,110],[200,210] → two islands len 10+10=20
    val denorm = Seq(
      (1L, 0, 10, 2L, 100, 110),
      (1L, 5, 20, 2L, 200, 210),
      (1L, 21, 30, 2L, 100, 110)
    ).toDF("src_trs_id", "src_trs_start", "src_trs_end",
      "dst_trs_id", "dst_trs_start", "dst_trs_end")
    val lengths = Seq((1L, 100), (2L, 200)).toDF("trs_id", "text_length")
    val out = BookBased.receptionInceptionBetweenBookCoverages(denorm, lengths)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("num_reuses_src") === 1L)
    assert(r.getAs[Long]("reuses_src_in_dst") === 30L)
    assert(r.getAs[Long]("num_reuses_dst") === 2L)
    assert(r.getAs[Long]("reuses_dst_in_src") === 20L)
    assert(r.getAs[Double]("coverage_src_in_dst") === 30.0)
    assert(r.getAs[Double]("coverage_dst_in_src") === 10.0)
  }
}

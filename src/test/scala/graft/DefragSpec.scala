package graft

import scala.util.Random

import graft.defrag.Defrag

/** Defrag UDAF vs the straight-line scan oracle (SURVEY.md §5.1, §7.4
  * risk 1: the window execution path must never call merge).
  */
class DefragSpec extends SparkTestBase {

  import spark.implicits._

  private def runWindow(pieces: Seq[(Long, Long, Int, Int)]): Map[Long, Long] = {
    // pieces: (piece_id, trs_id, trs_start, trs_end)
    val df = pieces.toDF("piece_id", "trs_id", "trs_start", "trs_end")
    Defrag.rawMappings(df)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  private def oracle(pieces: Seq[(Long, Long, Int, Int)]): Map[Long, Long] =
    pieces.groupBy(_._2).flatMap { case (_, doc) =>
      val sorted = doc.map { case (id, _, s, e) => (s, e, id) }
        .sortBy { case (s, _, id) => (s, id) }
      Defrag.scanDocument(sorted)
    }

  test("window UDAF matches straight-line scan on crafted cases") {
    // FIXTURES.md §4: within/outside 180 window, limit clamp at 10 and
    // 180, mid-range limit, identical starts ordered by piece_id.
    val pieces: Seq[(Long, Long, Int, Int)] = Seq(
      // doc 1: two nearly identical pieces (limit clamps to 10) → merge
      (1L, 1L, 100, 200), (2L, 1L, 105, 205),
      // doc 1: just outside limit (len 100 → limit 25; |start diff|=30)
      (3L, 1L, 135, 235),
      // doc 1: far away (outside 180 window entirely)
      (4L, 1L, 900, 1000),
      // doc 2: long pieces, limit clamps at 180
      (5L, 2L, 0, 4000), (6L, 2L, 150, 4100),
      // doc 2: tiny pieces, limit clamps at 10
      (7L, 2L, 5000, 5008), (8L, 2L, 5011, 5020),
      // doc 3: identical starts → tie broken by piece_id order
      (9L, 3L, 50, 150), (10L, 3L, 50, 152), (11L, 3L, 50, 149)
    )
    val got = runWindow(pieces)
    val want = oracle(pieces)
    assert(got === want)
    // crafted expectations, hand-checked:
    assert(got(2L) === 1L)   // merged into first
    assert(got(3L) === 3L)   // outside limit → itself
    assert(got(6L) === 5L)   // long pieces, 150 ≤ 180 limit
    assert(got(8L) === 8L)   // tiny: len 8/4=2 → limit clamps to 10;
    // |5011-5000| = 11 > 10 → stays its own piece
  }

  test("tiny adjacent pieces outside clamped limit stay separate") {
    val got = runWindow(Seq((7L, 2L, 5000, 5008), (8L, 2L, 5011, 5020)))
    assert(got(8L) === 8L)
  }

  test("window UDAF matches oracle on random inputs (merge never called)") {
    val rnd = new Random(42)
    for (_ <- 1 to 5) {
      val raw = Seq.fill(60) {
        val doc = 1L + rnd.nextInt(4)
        val s = rnd.nextInt(2000)
        (doc, s, s + 1 + rnd.nextInt(400))
      }
      val pieces = raw.distinct.zipWithIndex.map { case ((doc, s, e), i) =>
        ((i + 1).toLong, doc, s, e)
      }
      assert(runWindow(pieces) === oracle(pieces))
    }
  }

  test("window UDAF matches the in-JVM scan over the FULL sf0.1 pieces table") {
    // second witness at driver scale: the fixtures above prove the
    // aggregator on crafted/random inputs; this re-derives every one
    // of the rows-only face's mappings from the SAME sf0.1 synthetic
    // pieces table with the straight-line per-document scan, entirely
    // in-JVM — so the face is independently recomputed, not only
    // count-pinned (RowsOnlyPinSpec)
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists,
      s"$dir not present on this machine")
    val raw = graft.queries.DomainQueries.synthRaw(spark, dir)
    val pieces = graft.textreuse.TextReuse.origPieces(
      graft.textreuse.TextReuse.textreuses(raw,
        graft.textreuse.TextReuse.textreuseIds(raw)))
      .select("piece_id", "trs_id", "trs_start", "trs_end")
    val got = Defrag.rawMappings(pieces).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = pieces.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._2).flatMap { case (_, doc) =>
        val sorted = doc.map { case (id, _, s, e) => (s, e, id) }
          .sortBy { case (s, _, id) => (s, id) }.toSeq
        Defrag.scanDocument(sorted)
      }.toMap
    assert(got.size === want.size)
    assert(got === want)
  }

  test("pieceIdMappings assigns dense contiguous defrag ids") {
    val df = Seq(
      (1L, 1L, 100, 200), (2L, 1L, 105, 205), (3L, 1L, 900, 1000),
      (4L, 2L, 0, 50)
    ).toDF("piece_id", "trs_id", "trs_start", "trs_end")
    val m = Defrag.pieceIdMappings(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // representatives 1, 3, 4 → dense ids 1..3 in sorted order
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("defragPieces takes min start / max end per merged group") {
    val pieces = Seq(
      (1L, 1L, 100, 200), (2L, 1L, 105, 205), (3L, 1L, 900, 1000)
    ).toDF("piece_id", "trs_id", "trs_start", "trs_end")
    val mappings = Seq((1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("orig_piece_id", "defrag_piece_id")
    val got = Defrag.defragPieces(pieces, mappings).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(got === Set((1L, 1L, 100, 205), (2L, 1L, 900, 1000)))
  }

  test("defragTextreuses counts merged original links") {
    val orig = Seq(
      (1L, 1L, 10L, 80, 90.0f), (2L, 2L, 10L, 70, 91.0f),
      (3L, 3L, 11L, 60, 92.0f)
    ).toDF("textreuse_id", "piece1_id", "piece2_id", "align_length", "positives_percent")
    val mappings = Seq((1L, 1L), (2L, 1L), (3L, 2L), (10L, 5L), (11L, 6L))
      .toDF("orig_piece_id", "defrag_piece_id")
    val got = Defrag.defragTextreuses(orig, mappings).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // edges: (1,5) from origs 1+2 → 2 links; (2,6) from orig 3 → 1 link
    assert(got === Set((1L, 1L, 5L, 2L), (2L, 2L, 6L, 1L)))
  }
}

package graft

import scala.util.Random

import graft.analytics.Coverages

class CoveragesSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force interval union honoring the reference's merge rule:
    * adjacent intervals (prev_end + 1 >= start) merge; island length is
    * max(end) - min(start) (reference: coverages.py:81-95).
    */
  private def bruteIslands(iv: Seq[(Int, Int)]): Seq[(Int, Int)] = {
    val sorted = iv.sortBy(identity)
    sorted.foldLeft(List.empty[(Int, Int)]) {
      case (Nil, (s, e)) => List((s, e))
      case ((is, ie) :: rest, (s, e)) =>
        if (ie + 1 >= s) (is, math.max(ie, e)) :: rest
        else (s, e) :: (is, ie) :: rest
    }.reverse
  }

  test("islandStats matches brute-force union on crafted cases") {
    // overlapping, nested, adjacent (must merge), disjoint
    val cases = Seq(
      (1L, Seq((1, 6), (7, 12))),            // adjacent -> one island len 11
      (2L, Seq((1, 10), (3, 5))),            // nested -> one island len 9
      (3L, Seq((1, 5), (10, 20), (4, 11))),  // chain-overlap -> one island
      (4L, Seq((1, 2), (10, 12)))            // disjoint -> two islands
    )
    val df = cases.flatMap { case (k, iv) => iv.map { case (s, e) => (k, 0L, s, e) } }
      .toDF("trs1_id", "trs2_id", "trs1_start", "trs1_end")
    val got = Coverages.islandStats(df, Seq("trs1_id", "trs2_id"),
        "trs1_start", "trs1_end", "n", "len")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    cases.foreach { case (k, iv) =>
      val islands = bruteIslands(iv)
      val expect = (islands.size.toLong, islands.map { case (s, e) => (e - s).toLong }.sum)
      assert(got(k) == expect, s"key $k: got ${got(k)}, expected $expect")
    }
  }

  test("islandStats matches brute force on 200 random keys (property)") {
    val rnd = new Random(42)
    val cases = (1L to 200L).map { k =>
      val n = 1 + rnd.nextInt(12)
      k -> Seq.fill(n) {
        val s = rnd.nextInt(100)
        (s, s + rnd.nextInt(30))
      }
    }
    val df = cases.flatMap { case (k, iv) => iv.map { case (s, e) => (k, 0L, s, e) } }
      .toDF("trs1_id", "trs2_id", "trs1_start", "trs1_end")
    val got = Coverages.islandStats(df, Seq("trs1_id", "trs2_id"),
        "trs1_start", "trs1_end", "n", "len")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    cases.foreach { case (k, iv) =>
      val islands = bruteIslands(iv)
      val expect = (islands.size.toLong, islands.map { case (s, e) => (e - s).toLong }.sum)
      assert(got(k) == expect, s"key $k: intervals $iv, got ${got(k)}, expected $expect")
    }
  }

  test("coverages is within [0, 100] and symmetric in structure") {
    val tr = Seq(
      (1L, 2L, 0, 50, 100, 160),
      (1L, 2L, 40, 90, 200, 260),
      (3L, 4L, 0, 99, 0, 99)
    ).toDF("trs1_id", "trs2_id", "trs1_start", "trs1_end", "trs2_start", "trs2_end")
    val lengths = Seq((1L, 100), (2L, 300), (3L, 100), (4L, 100))
      .toDF("trs_id", "text_length")
    val rows = Coverages.coverages(tr, lengths).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val c12 = r.getAs[Double]("coverage_t1_t2")
      val c21 = r.getAs[Double]("coverage_t2_t1")
      assert(c12 >= 0 && c12 <= 100)
      assert(c21 >= 0 && c21 <= 100)
    }
    // pair (1,2): t1 islands = (0,90) -> len 90 -> 90% of 100
    val p12 = rows.find(_.getLong(0) == 1L).get
    assert(p12.getAs[Long]("t1_reuses") == 1L)
    assert(p12.getAs[Double]("coverage_t1_t2") == 90.0)
    // t2: two islands (100,160),(200,260) -> 120 chars of 300 -> 40%
    assert(p12.getAs[Long]("t2_reuses") == 2L)
    assert(p12.getAs[Double]("coverage_t2_t1") == 40.0)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.layout.ZOrder

class ZOrderSpec extends SparkTestBase {

  /** Reference interleave: bit b of value i lands at b*n + i. */
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for ((v, i) <- vals.zipWithIndex; b <- 0 until bits)
      z |= ((v >> b) & 1L) << (b * vals.size + i)
    z
  }

  test("zValue matches the reference interleave on a value sweep") {
    import spark.implicits._
    val pairs = for (x <- 0L to 40L; y <- Seq(0L, 1L, 7L, 255L, 65535L)) yield (x, y)
    val out = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(Seq(col("x"), col("y"))).as("z"))
      .collect()
    for (r <- out)
      assert(r.getLong(2) === mortonRef(Seq(r.getLong(0), r.getLong(1)), 16),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
  }

  test("three-dimension interleave and masking of out-of-range bits") {
    import spark.implicits._
    val out = Seq((5L, 3L, 6L)).toDF("a", "b", "c")
      .select(ZOrder.zValue(Seq(col("a"), col("b"), col("c")), bits = 4).as("z"))
      .head().getLong(0)
    assert(out === mortonRef(Seq(5L, 3L, 6L), 4))
    // values >= 2^bits are masked, not overflowed into neighbours' bits
    val masked = Seq((16L + 5L, 0L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), bits = 4).as("z"))
      .head().getLong(0)
    assert(masked === mortonRef(Seq(5L, 0L), 4))
  }

  test("z-clustering prunes on the non-leading dimension where 1-d sort cannot") {
    import spark.implicits._
    // deterministic pseudo-random points on a 256x256 grid. NOTE the
    // per-partition bounding-box AREA is ~invariant under any layout
    // (total area / partitions); what z-order buys is bounded extent in
    // EVERY interleaved dimension — min/max stats prune a filter on y,
    // which an x-sorted layout cannot prune at all.
    val pts = (0 until 8192).map { i =>
      val h = i * 2654435761L
      ((h >>> 8) & 255L, (h >>> 24) & 255L)
    }.toDF("x", "y")

    // partitions whose [min_y, max_y] stats overlap the filter window
    // y < 32 — the file-skipping a parquet reader would do
    def overlapping(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min("y").as("lo"), max("y").as("hi"))
        .where(col("lo") < 32).count()

    val zHit = overlapping(ZOrder.cluster(pts, Seq("x", "y"), numFiles = 16, bits = 8))
    val xHit = overlapping(pts.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    // x-sort leaves y unconstrained: every partition spans y≈[0,255]
    // and none can be skipped; z-order confines y per partition
    assert(xHit === 16L, s"x-sorted layout unexpectedly pruned y ($xHit/16)")
    assert(zHit <= 8L, s"z-order layout should skip most partitions, hit $zHit/16")
  }

  test("cluster preserves rows and drops the helper column") {
    import spark.implicits._
    val pts = (0 until 100).map(i => (i.toLong, (i * 7 % 100).toLong)).toDF("x", "y")
    val out = ZOrder.cluster(pts, Seq("x", "y"), numFiles = 4)
    assert(out.columns.toSeq === Seq("x", "y"))
    assert(out.count() === 100)
  }
}

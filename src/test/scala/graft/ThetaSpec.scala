package graft

import org.apache.spark.sql.functions._

import graft.expressions.ThetaAgg
import graft.sketch.Sketches

/** Theta sketch set algebra: exact-mode equality with true counts,
  * merge/partitioning independence, intersection and A-NOT-B
  * correctness, and the estimation-mode error bound past the nominal
  * threshold (the regime the oracle can no longer check).
  */
class ThetaSpec extends SparkTestBase {
  import spark.implicits._

  test("exact mode: estimates equal true distinct counts exactly") {
    // 3000 distinct < 4096 nominal: exact mode end-to-end, including
    // through shuffle serialization (8 input partitions force merges)
    val df = (0L until 6000L).map(i => ("g", i % 3000L)).toDF("g", "key")
      .repartition(8)
    val est = Sketches.thetaSketches(df, Seq("g"), "key")
      .select(ThetaAgg.estimate(col("sketch"))).as[Double].head()
    assert(est === 3000.0)
  }

  test("union of per-batch sketches == whole-corpus count; intersection and aNotB exact") {
    val a = (0L until 900L).map(("a", _))
    val b = (600L until 1500L).map(("b", _)) // overlap 600..899 = 300
    val sk = Sketches.thetaSketches(
      (a ++ b).toDF("batch", "key").withColumn("g", lit("x")),
      Seq("g", "batch"), "key")
    val uni = Sketches.thetaUnionEstimate(
      sk.select("g", "sketch", "n_rows"), "g")
      .select("distinct_est").as[Double].head()
    assert(uni === 1500.0)
    val both = Sketches.thetaIntersectEstimate(
      sk.select("g", "sketch", "n_rows"), "g")
      .select("overlap_est").as[Double].head()
    assert(both === 300.0)
    val Seq(ska, skb) = sk.orderBy("batch").select("sketch")
      .as[Array[Byte]].collect().toSeq
    val churn = Seq((ska, skb)).toDF("a", "b")
      .select(ThetaAgg.estimate(ThetaAgg.aNotB(col("a"), col("b"))))
      .as[Double].head()
    assert(churn === 600.0)
  }

  test("intersection of an all-null group is null; empty batch intersects to zero") {
    val sk = Sketches.thetaSketches(
      Seq(("x", "b1", 1L), ("x", "b2", 2L)).toDF("g", "batch", "key"),
      Seq("g", "batch"), "key")
    // two disjoint singleton batches: intersection exists and is 0
    val z = Sketches.thetaIntersectEstimate(
      sk.select("g", "sketch", "n_rows"), "g")
      .select("overlap_est").as[Double].head()
    assert(z === 0.0)
    // all-null sketch column → null result, not a crash
    val n = Seq(("y", null: Array[Byte], 0L)).toDF("g", "sketch", "n_rows")
    val r = Sketches.thetaIntersectEstimate(n, "g")
      .select("overlap_est").as[Option[Double]].head()
    assert(r.isEmpty)
  }

  test("estimation mode honors the published relative error bound") {
    // 60k distinct >> 4096 nominal: rse ≈ 1/sqrt(4096) ≈ 1.6%; allow 4x
    val df = (0L until 60000L).map(i => ("g", i * 2654435761L)).toDF("g", "key")
    val est = Sketches.thetaSketches(df, Seq("g"), "key")
      .select(ThetaAgg.estimate(col("sketch"))).as[Double].head()
    assert(math.abs(est - 60000.0) / 60000.0 < 0.065, s"estimate $est")
  }
}

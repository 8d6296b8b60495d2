package graft

import org.apache.spark.sql.functions._

import graft.core.Skew

class SkewSpec extends SparkTestBase {

  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // hot key 1 has 5000 rows; others 1 each
    val large = (Seq.fill(5000)(1L) ++ (2L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "v")
    val expected = large.join(small, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val got = Skew.saltedJoin(large, small, "k", salt = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(got === expected)
  }

  test("diagnoseKey surfaces the hot key with exact count and fraction") {
    // 700 rows of key 1, 200 of key 2, 100 spread over 3..102
    val df = (Seq.fill(700)(1L) ++ Seq.fill(200)(2L) ++ (3L to 102L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val top = graft.core.Skew.diagnoseKey(df, "k", topN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top(0) === ((1L, 700L, 700000L)))  // 70.0% of 1000 rows
    assert(top(1) === ((2L, 200L, 200000L)))
    assert(top(2)._2 === 1L)                  // the flat tail
  }

  test("salting spreads a hot key over multiple partitions") {
    val large = Seq.fill(1000)(1L).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val salted = large.withColumn("_salt", pmod(hash(col("k"), col("payload")), lit(8)))
    val nSalts = salted.select("_salt").distinct().count()
    assert(nSalts > 4, s"expected hot key spread over >4 salts, got $nSalts")
  }
}

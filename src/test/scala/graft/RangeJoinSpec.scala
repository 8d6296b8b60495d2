package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("binned overlap join equals the naive range join, each pair once") {
    // intervals spanning multiple bins, touching endpoints, disjoint
    // keys, and bin-boundary starts
    val l = Seq((1L, 10L, 0, 300), (1L, 11L, 256, 256), (1L, 12L, 600, 700),
        (2L, 20L, 0, 50))
      .toDF("k", "lid", "ls", "le")
    val r = Seq((1L, 30L, 100, 260), (1L, 31L, 300, 599), (1L, 32L, 512, 640),
        (2L, 33L, 51, 60))
      .toDF("k", "rid", "rs", "re")
    val got = RangeJoin.intervalOverlapJoin(l, r, Seq("k"), "ls", "le", "rs", "re",
        binSize = 256)
      .select("lid", "rid").collect().map(rr => (rr.getLong(0), rr.getLong(1)))
    val naive = l.join(r, Seq("k"))
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(rr => (rr.getLong(0), rr.getLong(1)))
    assert(got.sorted.toSeq === naive.sorted.toSeq)   // exactness
    assert(got.length === got.distinct.length)        // no duplicate emits
    // (1,10)×(1,31) touch at 300 → overlap; (1,12)×(1,31) end just
    // before 600 → disjoint; (2,20)×(2,33) disjoint (50 < 51)
    assert(got.toSet === Set((10L, 30L), (10L, 31L), (11L, 30L), (12L, 32L)))
  }

  test("seeded random intervals: binned == naive for several bin sizes") {
    val rnd = new scala.util.Random(11)
    val mk = (n: Int) => Seq.tabulate(n) { i =>
      val s = rnd.nextInt(2000)
      (rnd.nextInt(6).toLong, i.toLong, s, s + rnd.nextInt(400))
    }
    val l = mk(300).toDF("k", "lid", "ls", "le")
    val r = mk(300).map { case (k, id, s, e) => (k, id + 1000, s, e) }
      .toDF("k", "rid", "rs", "re")
    val naive = l.join(r, Seq("k"))
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(rr => (rr.getLong(0), rr.getLong(1)))
      .sorted.toSeq
    for (bin <- Seq(1, 7, 256, 4096)) {
      val got = RangeJoin.intervalOverlapJoin(l, r, Seq("k"),
          "ls", "le", "rs", "re", binSize = bin)
        .select("lid", "rid").collect().map(rr => (rr.getLong(0), rr.getLong(1)))
      assert(got.length === got.distinct.length, s"dup emits at bin=$bin")
      assert(got.sorted.toSeq === naive, s"mismatch at bin=$bin")
    }
  }

  test("plan is an equi-join on (key, bin), not a nested loop") {
    val l = (1L to 100L).map(i => (i % 5, i, (i * 13 % 900).toInt))
      .map { case (k, id, s) => (k, id, s, s + 120) }
      .toDF("k", "lid", "ls", "le")
    val r = l.select(col("k"), col("lid").as("rid"), col("ls").as("rs"),
      col("le").as("re"))
    val plan = RangeJoin.intervalOverlapJoin(l, r, Seq("k"), "ls", "le", "rs", "re")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan as a nested loop:\n$plan")
  }
}

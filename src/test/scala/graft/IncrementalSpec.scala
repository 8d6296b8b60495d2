package graft

import org.apache.spark.sql.functions._

import graft.core.Incremental

/** Incremental aggregate state: batch-merged state equals the
  * single-pass aggregate exactly, in any merge order, through repeated
  * delta absorption.
  */
class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = {
    val rnd = new scala.util.Random(31)
    Seq.fill(5000)((s"g${rnd.nextInt(7)}", rnd.nextDouble() * 100.0 - 20.0))
  }

  private def collectState(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "n_rows", "sum_cents", "min_cents", "max_cents")
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("any batch split + any merge order == single pass, exactly") {
    val full = collectState(
      Incremental.aggState(rows.toDF("g", "v"), Seq("g"), "v"))
    for (nBatches <- Seq(2, 5); seed <- Seq(1, 2)) {
      val rnd = new scala.util.Random(seed)
      val tagged = rows.map { case (g, v) => (g, v, rnd.nextInt(nBatches)) }
      val states = (0 until nBatches).map(i =>
        Incremental.aggState(
          tagged.filter(_._3 == i).map(t => (t._1, t._2)).toDF("g", "v"),
          Seq("g"), "v"))
      val shuffled = new scala.util.Random(seed + 7).shuffle(states)
      assert(collectState(Incremental.mergeStates(shuffled, Seq("g"))) === full,
        s"nBatches=$nBatches seed=$seed")
    }
  }

  test("state absorbs deltas one at a time (the daily-ingest loop)") {
    val batches = rows.grouped(1000).toSeq
    var state = Incremental.aggState(batches.head.toDF("g", "v"), Seq("g"), "v")
    for (b <- batches.tail)
      state = Incremental.mergeStates(
        Seq(state, Incremental.aggState(b.toDF("g", "v"), Seq("g"), "v")),
        Seq("g"))
    assert(collectState(state) ===
      collectState(Incremental.aggState(rows.toDF("g", "v"), Seq("g"), "v")))
  }

  test("streaming face: foreachBatch-merged state == batch rebuild, exactly") {
    // the daily-rollup loop as a stream: each micro-batch's aggState
    // merges into the running state — proving the batch operator slots
    // into foreachBatch unchanged (merge is associative, and micro-
    // batch boundaries are just another batch split)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Double)]
    @volatile var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = input.toDS().toDF("g", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = Incremental.aggState(batch, Seq("g"), "v")
          .localCheckpoint() // detach from the transient batch plan
        state = Some(state match {
          case Some(prev) =>
            Incremental.mergeStates(Seq(prev, s), Seq("g")).localCheckpoint()
          case None => s
        })
      }
      .start()
    try {
      val batches = rows.grouped(1700).toSeq
      for (b <- batches) { input.addData(b: _*); q.processAllAvailable() }
      assert(collectState(state.get) ===
        collectState(Incremental.aggState(rows.toDF("g", "v"), Seq("g"), "v")))
    } finally q.stop()
  }

  test("read face derives the exact fixed-point average") {
    val st = Incremental.aggState(
      Seq(("a", 1.0), ("a", 2.0), ("a", 2.005)).toDF("g", "v"), Seq("g"), "v")
    val r = Incremental.readAggregates(st, Seq("g"))
      .select("n_rows", "sum_cents", "avg_x10000").as[(Long, Long, Long)].head()
    // cents: 100 + 200 + 200 (floor) = 500; avg = 500*100/3 = 16666 exactly
    assert(r === ((3L, 500L, 16666L)))
  }

  test("read face stays exact past 2^53 (long division, not double)") {
    // sum_cents·100 = 2^55·100 ≈ 3.6e18 — far beyond double's 2^53
    // integer range, so a double-division path would be off by one.
    // Expected quotient from BigInt arithmetic.
    val big = 1L << 55
    val st = Seq(("a", 3L, big, big, big))
      .toDF("g", "n_rows", "sum_cents", "min_cents", "max_cents")
    val got = Incremental.readAggregates(st, Seq("g"))
      .select("avg_x10000").as[Long].head()
    val expected = ((BigInt(big) * 100) / 3).toLong
    assert(got === expected)
  }
}

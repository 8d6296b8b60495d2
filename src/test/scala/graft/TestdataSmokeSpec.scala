package graft

/** Executes EVERY registered driver query end-to-end against the real
  * driver parquet (TESTDATA.md, sf0.001) — the gate ContractSpec cannot
  * provide. Round 6 lost seven q_events_* queries from the correctness
  * tree because the driver regenerated events.parquet with a different
  * physical timestamp type (nanos → micros/NTZ) and no spec ever read
  * the actual testdata: every suite uses hand-built fixtures, so the
  * analysis-time cast failures only surfaced in the driver's Verify run
  * where they are caught, logged, and silently dropped. This suite runs
  * each query against the same files Verify reads and forces full
  * execution through the noop sink (a count() would let Catalyst prune
  * the very projections most likely to break).
  *
  * Skips (not fails) when the harness testdata directory is absent, so
  * the build stays green on machines without /root/testdata.
  */
class TestdataSmokeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def have: Boolean = new java.io.File(s"$dir/events.parquet").exists

  test("events.ts normalizes to a session-zone TIMESTAMP for every generation") {
    assume(have, s"$dir not present on this machine")
    // the exact round-6 regression: whatever physical type the driver
    // writes (nanos-long, micros NTZ, micros UTC), Tables.events must
    // hand queries a plain TimestampType column
    val t = graft.queries.Tables.events(spark, dir).schema("ts").dataType
    assert(t == org.apache.spark.sql.types.TimestampType,
      s"events.ts surfaced as $t — downstream epoch casts/window fns will fail analysis")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes on driver testdata") {
      assume(have, s"$dir not present on this machine")
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    }
  }
}

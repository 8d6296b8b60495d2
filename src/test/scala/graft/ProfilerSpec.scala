package graft

import graft.core.Profiler

class ProfilerSpec extends SparkTestBase {

  test("profile computes rows/nulls/distincts/min-max per column") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")), (3L, Some("a")))
      .toDF("k", "v")
    val out = Profiler.profile(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(out("k") === ((4L, 0L, 3L, "1", "3")))
    assert(out("v") === ((4L, 1L, 2L, "a", "b")))
  }

  test("all statistics come from ONE scan of the source") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // sparkPlan, not executedPlan: AQE wraps the latter in an opaque
    // AdaptiveSparkPlanExec that collect() cannot traverse
    val scans = Profiler.profile(docs, Seq("doc_id", "text", "lang"))
      .queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    assert(scans.size === 1,
      s"profiler must single-scan the table, found ${scans.size} scans")
  }
}

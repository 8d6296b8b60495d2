package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asOfJoin attaches the latest right row at or before left time") {
    val left = Seq(
      (1L, 1L, ts(5)), (2L, 1L, ts(15)), (3L, 1L, ts(2)),
      (4L, 2L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(3), 30.0), (1L, ts(10), 100.0),
      (2L, ts(20), 7.0)).toDF("user_id", "ts", "v")
    val got = AsOf.asOfJoin(left, right, Seq("user_id"), "ts", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got(1L) === Some(30.0))  // ts 5 → right at ts 3
    assert(got(2L) === Some(100.0)) // ts 15 → right at ts 10
    assert(got(3L) === None)        // ts 2 → nothing before
    assert(got(4L) === None)        // user 2: right only at ts 20 > 10
  }

  test("asOfJoin is inclusive at equal timestamps") {
    val left = Seq((1L, 1L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(10), 5.0)).toDF("user_id", "ts", "v")
    val got = AsOf.asOfJoin(left, right, Seq("user_id"), "ts", Seq("v")).collect()
    assert(got.head.getDouble(3) === 5.0)
  }

  test("asOfJoin preserves left row count and extra left columns") {
    val left = Seq((1L, 1L, ts(5), "a"), (2L, 1L, ts(6), "b"))
      .toDF("event_id", "user_id", "ts", "tag")
    val right = Seq((1L, ts(1), 1.0)).toDF("user_id", "ts", "v")
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts", Seq("v"))
    assert(out.count() === 2)
    assert(out.columns.toSet === Set("user_id", "ts", "event_id", "tag", "v"))
    assert(out.where(col("tag") === "a").head.getDouble(4) === 1.0)
  }
}

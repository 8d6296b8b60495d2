package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd

class ScdSpec extends SparkTestBase {

  import spark.implicits._

  // (user, state, ts, tie) change log with consecutive repeats, an
  // interleaved revisit (A→B→A must give THREE intervals, not two) and
  // a null state
  private def log = Seq(
    (1L, Some("A"), 10L, 1L),
    (1L, Some("A"), 20L, 2L), // consecutive repeat — collapses
    (1L, Some("B"), 30L, 3L),
    (1L, Some("A"), 40L, 4L), // revisit — a NEW interval
    (2L, None: Option[String], 15L, 5L),
    (2L, None, 25L, 6L),      // null repeat — collapses null-safely
    (2L, Some("C"), 35L, 7L)
  ).toDF("user_id", "state", "ts", "tie")

  private def build(df: org.apache.spark.sql.DataFrame) =
    Scd.buildType2(df, Seq("user_id"), "state", "ts", "tie")

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "state", "version", "effective_from",
        "effective_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2),
        r.getLong(3), Option(r.get(4)), r.getBoolean(5)))
      .toSet

  test("buildType2 collapses repeats, versions revisits, closes intervals") {
    val got = key(build(log))
    assert(got === Set(
      (1L, Some("A"), 1L, 10L, Some(30L), false),
      (1L, Some("B"), 2L, 30L, Some(40L), false),
      (1L, Some("A"), 3L, 40L, None, true),
      (2L, None, 1L, 15L, Some(35L), false),
      (2L, Some("C"), 2L, 35L, None, true)))
  }

  test("buildType2 invariants: one open interval per key, chained bounds") {
    val dim = build(log).collect()
    val byKey = dim.groupBy(_.getAs[Long]("user_id"))
    byKey.foreach { case (_, rows) =>
      assert(rows.count(_.getAs[Boolean]("is_current")) === 1)
      val sorted = rows.sortBy(_.getAs[Long]("version"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("effective_to") ===
            b.getAs[Long]("effective_from"),
            "each interval must close exactly where the next opens")
        case _ =>
      }
    }
  }

  test("applyChanges equals a full rebuild, including late arrivals") {
    // split so user 1's batch contains a LATE change (ts 25, between
    // history rows) — incremental must splice, not append
    val hist = log.where(col("tie") =!= 4L && col("tie") =!= 7L)
    val batch = Seq((1L, Some("Z"), 25L, 8L), (1L, Some("A"), 40L, 4L),
        (2L, Some("C"), 35L, 7L), (3L, Some("N"), 5L, 9L))
      .toDF("user_id", "state", "ts", "tie")
    val incremental = Scd.applyChanges(build(hist), batch,
      Seq("user_id"), "state", "ts", "tie")
    val full = build(log.unionByName(
      Seq((1L, Some("Z"), 25L, 8L), (3L, Some("N"), 5L, 9L))
        .toDF("user_id", "state", "ts", "tie")))
    assert(key(incremental) === key(full))
  }

  test("applyChanges leaves untouched keys byte-identical") {
    val dim = build(log)
    val batch = Seq((3L, Some("N"), 5L, 9L)).toDF("user_id", "state", "ts", "tie")
    val out = Scd.applyChanges(dim, batch, Seq("user_id"), "state", "ts", "tie")
    assert(key(out.where(col("user_id") =!= 3L)) === key(dim))
    assert(out.where(col("user_id") === 3L).count() === 1L)
  }

  test("asOfSnapshot returns the state valid at the probe time") {
    val dim = build(log)
    val at32 = Scd.asOfSnapshot(dim, lit(32L))
      .select("user_id", "state").as[(Long, Option[String])].collect().toSet
    assert(at32 === Set((1L, Some("B")), (2L, None)))
    // probe before a key's first change sees nothing for that key
    val at12 = Scd.asOfSnapshot(dim, lit(12L))
      .select("user_id").as[Long].collect().toSet
    assert(at12 === Set(1L))
  }

  test("buildType2 is partitioning-independent") {
    assert(key(build(log.repartition(7))) === key(build(log)))
  }
}

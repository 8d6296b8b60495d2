package graft

import graft.core.Merge

/** Snapshot-merge (upsert) semantics: batch wins, every row classified,
  * presence decided by markers — not payload nullability.
  */
class MergeSpec extends SparkTestBase {

  private def df(rows: (java.lang.Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "a", "b")
  }

  test("mergeSnapshot classifies insert/update/unchanged/carry; batch wins") {
    val snapshot = df(
      (1L, "x", "p"),  // carried (absent from batch)
      (2L, "y", "q"),  // updated by batch
      (3L, "z", "r"))  // unchanged (batch re-sends identical payload)
    val batch = df(
      (2L, "y2", "q"), // update: one payload column differs
      (3L, "z", "r"),  // unchanged
      (4L, "w", "s"))  // insert: new key
    val out = Merge.mergeSnapshot(snapshot, batch, "id", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(out === Seq(
      (1L, "x", "p", "carry"),
      (2L, "y2", "q", "update"),
      (3L, "z", "r", "unchanged"),
      (4L, "w", "s", "insert")))
  }

  test("null payloads: null==null is unchanged, null-vs-value is update") {
    val snapshot = df((1L, null, "p"), (2L, "y", "q"))
    val batch = df((1L, null, "p"), (2L, null, "q"))
    val out = Merge.mergeSnapshot(snapshot, batch, "id", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(3)))
      .sortBy(_._1)
    // a legitimately-null payload is NOT absence: id 1 round-trips as
    // unchanged; id 2's null overwrites the snapshot value (batch wins)
    assert(out === Seq((1L, None, "unchanged"), (2L, None, "update")))
  }

  test("output covers exactly the union of keys, one row each") {
    val snapshot = df((1L, "x", "p"), (2L, "y", "q"))
    val batch = df((2L, "y", "q"), (3L, "w", "s"))
    val out = Merge.mergeSnapshot(snapshot, batch, "id", Seq("a", "b"))
    assert(out.count() === 3L)
    assert(out.select("id").distinct().count() === 3L)
  }
}

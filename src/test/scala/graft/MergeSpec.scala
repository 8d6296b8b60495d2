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

  test("bucketDigests: order/partitioning-free; one changed row flips exactly its bucket") {
    import spark.implicits._
    val rows = (0L until 2000L).map(i => (i, i * 7L))
    val base = rows.toDF("k", "v")
    val digest = Merge.bucketDigests(base, "k", "v", nBuckets = 16)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // partitioning independence: 13 shuffled partitions, same digests
    val reparted = Merge.bucketDigests(
      scala.util.Random.shuffle(rows).toDF("k", "v").repartition(13),
      "k", "v", nBuckets = 16)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(reparted === digest)
    // one payload change: only bucket 777 % 16 differs
    val changed = rows.map { case (k, v) => (k, if (k == 777L) v + 1 else v) }
    val diff = Merge.digestDiff(
        Merge.bucketDigests(base, "k", "v", nBuckets = 16),
        Merge.bucketDigests(changed.toDF("k", "v"), "k", "v", nBuckets = 16))
      .select("bucket", "matches").as[(Long, Boolean)].collect().toMap
    assert(diff.count(!_._2) === 1)
    assert(!diff(777L % 16))
    // a deleted row flips its bucket via n_rows even if digests XOR out
    val dropped = Merge.digestDiff(
        Merge.bucketDigests(base, "k", "v", nBuckets = 16),
        Merge.bucketDigests(rows.filterNot(_._1 == 400L).toDF("k", "v"),
          "k", "v", nBuckets = 16))
      .select("bucket", "matches").as[(Long, Boolean)].collect().toMap
    assert(dropped.count(!_._2) === 1)
    assert(!dropped(400L % 16))
  }
}

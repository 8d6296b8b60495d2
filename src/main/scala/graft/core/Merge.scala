package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental snapshot maintenance — the MERGE INTO / upsert operator
  * every periodically-refreshed corpus table needs (the reference
  * re-materializes assets whole, `etl_textreuse` Dagster assets; at
  * 100 TB a daily drop must merge, not rebuild).
  *
  * [[mergeSnapshot]] is the batch set-algebra face: one full-outer
  * equi-join on the key produces the next snapshot version with every
  * row classified — the classification column is what downstream
  * incremental operators key on (e.g. only `insert`/`update` rows
  * re-enter the dedup/index pipelines; `carry`/`unchanged` rows keep
  * their derived artifacts).
  *
  * Scale shape: ONE shuffle per side on the merge key, then a map-only
  * projection; payload comparison is columnar null-safe equality (no
  * hashing, no UDF — stays in whole-stage codegen). Compose with
  * `Catalog.materializeAtomic` for the crash-safe publish and
  * `Catalog.materializeBucketed(key)` to make the NEXT merge's join
  * shuffle-free on the snapshot side.
  */
object Merge {

  /** Merge `batch` into `snapshot` (both carrying `key` + `payload`
    * columns, same schema). Batch wins on key conflict. Returns one row
    * per key in either input: the post-merge payload plus a `change`
    * column — 'insert' (new key), 'update' (key in both, payload
    * differs), 'unchanged' (key in both, payload null-safe equal),
    * 'carry' (snapshot-only key, retained). Key uniqueness per input is
    * the caller's contract (a duplicate key fans the join out). Deletes
    * are out of scope without tombstones; feed a tombstone batch and
    * drop its rows downstream.
    *
    * Presence is tracked by dedicated marker literals, NOT payload
    * nullability — a legitimately-NULL payload column is not absence.
    */
  def mergeSnapshot(snapshot: DataFrame, batch: DataFrame, key: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val s = snapshot.select(
      col(key) +: lit(true).as("in_snapshot") +: payload.map(c => col(c).as(s"s_$c")): _*)
    val b = batch.select(
      col(key) +: lit(true).as("in_batch") +: payload.map(c => col(c).as(s"b_$c")): _*)
    val joined = s.join(b, Seq(key), "full_outer")
    val samePayload = payload.map(c => col(s"b_$c") <=> col(s"s_$c")).reduce(_ && _)
    val change = when(col("in_snapshot").isNull, "insert")
      .when(col("in_batch").isNull, "carry")
      .when(samePayload, "unchanged")
      .otherwise("update")
    joined.select(
      col(key) +:
        payload.map(c =>
          when(col("in_batch").isNotNull, col(s"b_$c")).otherwise(col(s"s_$c")).as(c)) :+
        change.as("change"): _*)
  }

  /** Order-independent bucket digests for snapshot reconciliation —
    * "which parts of these two 100 TB tables differ" WITHOUT a
    * row-level compare: rows hash into `nBuckets` by key, each bucket
    * folds its row fingerprints with bit_xor (commutative, associative
    * — partitioning- and order-free), and two tables' digest tables
    * (nBuckets rows each) compare in a trivial join. Only buckets with
    * differing digests need the expensive row-level [[mergeSnapshot]]
    * pass; in the common mostly-unchanged case that's a >99% cut.
    *
    * The row fingerprint is the engine-portable mid-square ladder
    * ([[graft.sketch.Sketches]]) over key·131 + payload, so digest
    * tables are re-derivable in ANSI SQL and a digest computed by a
    * different system (the DuckDB oracle stands in for one) matches
    * bit-for-bit. XOR folding means a bucket where one row changed
    * XORs to a different digest with certainty for single changes
    * (a·131+v is injective enough mod 2³¹−1 for distinct rows); k
    * simultaneous changes cancel only if their fingerprint XOR happens
    * to be zero — vanishing for 31-bit fingerprints.
    */
  def bucketDigests(df: DataFrame, keyCol: String, valueCol: String,
      nBuckets: Int = 1024): DataFrame = {
    val fp = graft.sketch.Sketches.slot(
      col(keyCol).cast("long") * lit(131L) + col(valueCol).cast("long"),
      lit(0), 2147483647L)
    df.select(pmod(col(keyCol).cast("long"), lit(nBuckets.toLong)).as("bucket"),
        fp.as("fp"))
      .groupBy("bucket")
      .agg(bit_xor(col("fp")).as("digest"), count(lit(1)).as("n_rows"))
  }

  /** Compare two [[bucketDigests]] tables: one row per bucket present
    * in either, with both digests/counts and a `matches` verdict —
    * the work-list for a targeted row-level reconcile.
    */
  def digestDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("bucket"), col("digest").as("digest_a"),
      col("n_rows").as("n_rows_a"))
    val r = b.select(col("bucket"), col("digest").as("digest_b"),
      col("n_rows").as("n_rows_b"))
    l.join(r, Seq("bucket"), "full_outer")
      .select(col("bucket"), col("digest_a"), col("n_rows_a"),
        col("digest_b"), col("n_rows_b"),
        (col("digest_a") <=> col("digest_b") &&
          col("n_rows_a") <=> col("n_rows_b")).as("matches"))
  }
}

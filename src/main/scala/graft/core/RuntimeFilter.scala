package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-join reduction by Bloom filter — the "runtime filter" pattern,
  * made explicit so it works ACROSS materialization boundaries.
  *
  * Spark's own injected runtime filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) only fire when
  * the build and probe sides sit in one query plan. In the 100 TB
  * pipeline shape — yesterday's curated id set pruning today's raw
  * scan, or a dimension filtered in a previous job — the small side is
  * a separate materialized table, so the optimizer never sees the
  * opportunity. This operator closes that gap: build (or load) a
  * [[graft.sketch.Sketches.bloomBits]] sketch of the build side's join
  * keys, collapse it to a dense word array (≤ `nWords` longs — a few
  * KiB however big the build side was), and prune the probe side with
  * a map-only, codegen-friendly membership test BEFORE its shuffle.
  *
  * Correctness is exact, not approximate: the Bloom test has no false
  * negatives, so every matching probe row survives pruning, and the
  * false positives it lets through are eliminated by the real join
  * that follows. [[bloomPrunedJoin]]'s result therefore equals the
  * plain join row-for-row — the driver oracle checks it against the
  * unpruned ANSI join.
  *
  * Scale shape: the probe side sees one `filter` with an array-literal
  * lookup (no join, no shuffle, no explode — the k probe positions are
  * unrolled into a k-term conjunction inside whole-stage codegen), so
  * rows that would die in the join die in the scan stage instead and
  * never pay the exchange. With a 1%-selective build side that is a
  * ~99% cut of the probe shuffle.
  */
object RuntimeFilter {

  /** Dense Bloom word array of `keyCol` over `df`, collected to the
    * driver. The aggregation is the sparse mergeable form from
    * [[graft.sketch.Sketches.bloomBits]] (partial map-side combine:
    * ≤ nWords rows per partition reach the driver regardless of row
    * count); the collect is bounded by `nWords`, not by data size.
    */
  def buildBloom(df: DataFrame, keyCol: String, nWords: Int = 256,
      k: Int = 4): Array[Long] = {
    // null build keys never match an inner equi-join, so dropping them
    // here keeps bloomPrunedJoin a drop-in replacement on nullable keys
    // (slot(null) would otherwise propagate null into the bit fold and
    // crash the getLong below)
    val sparse = graft.sketch.Sketches.bloomBits(
        df.where(col(keyCol).isNotNull)
          .select(lit("").as("g"), col(keyCol).cast("long").as("key")),
        "g", "key", nWords, k)
      .select("word_idx", "bits").collect()
    val words = new Array[Long](nWords)
    sparse.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Membership predicate: true iff every one of `key`'s k probe bits
    * is set in `words`. False ⇒ definitely absent from the build side;
    * true ⇒ present up to the Bloom false-positive rate.
    *
    * Delegates to the native kernel ([[graft.expressions.BloomProbe]]):
    * the Column formulation below unrolls k conjunction terms that
    * each embed the words array literal plus the full slot hash chain
    * — an expression tree that blows past codegen's method budget and
    * runs interpreted, ~10× slower than the plain join it prunes. The
    * Column form survives as [[mightContainColumns]], the independent-
    * formulation parity witness RuntimeFilterSpec pins against the
    * kernel.
    */
  def mightContain(key: Column, words: Array[Long], k: Int = 4): Column =
    graft.expressions.BloomProbe(key.cast("long"), words, k)

  /** The Column/HOF-free formulation of [[mightContain]] — spec-only:
    * k unrolled conjunction terms over the same slot grammar, kept as
    * the reference implementation whose independent semantics guard
    * the imperative kernel. Not for hot paths; see [[mightContain]].
    */
  private[graft] def mightContainColumns(key: Column, words: Array[Long],
      k: Int = 4): Column = {
    val nBits = words.length.toLong * graft.sketch.Sketches.BitsPerWord
    val arr = lit(words)
    (0 until k).map { i =>
      val p = graft.sketch.Sketches.slot(key.cast("long"), lit(i), nBits)
      val word = element_at(arr,
        (p / graft.sketch.Sketches.BitsPerWord).cast("int") + 1)
      call_function("shiftright", word,
          (p % graft.sketch.Sketches.BitsPerWord).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Inner equi-join of `probe` against `build` on probeKey = buildKey,
    * with the probe side Bloom-pruned before its exchange. Exactly
    * equivalent to `probe.join(build, probe(probeKey) === build(buildKey))`
    * — the Bloom only removes rows the join would drop anyway.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, nWords: Int = 256,
      k: Int = 4): DataFrame = {
    val words = buildBloom(build, buildKey, nWords, k)
    probe.where(mightContain(col(probeKey), words, k))
      .join(build, col(probeKey) === col(buildKey))
  }
}

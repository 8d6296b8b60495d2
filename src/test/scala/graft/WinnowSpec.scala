package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

class WinnowSpec extends SparkTestBase {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  // 20 distinct filler tokens so k-gram hashes are varied
  private def filler(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(seed * 7 + i * 13) % 97}x").mkString(" ")

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    val k = 3; val w = 4
    val shared = "copied span alpha beta gamma delta epsilon" // 7 = w+k tokens
    val d = docs(
      (1L, s"${filler(1, 30)} $shared ${filler(2, 30)}", "a"),
      (2L, s"${filler(3, 25)} $shared ${filler(4, 40)}", "b"))
    val fp = TextAnalysis.winnowFingerprints(d, k, w)
      .select("doc_id", "fp_hash").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(fp(1L).intersect(fp(2L)).nonEmpty,
      "documents sharing a >= w+k-1 token run must share a fingerprint hash")
  }

  test("winnowing density: roughly 2/(w+1) of k-grams selected") {
    // all-distinct tokens -> iid-like hash stream, where the classic
    // expected winnowing density 2/(w+1) applies
    val d = docs((1L, (0 until 400).map(i => s"tok${i}q").mkString(" "), "a"))
    val nShingles = 400 - 2 // k=3
    val n = TextAnalysis.winnowFingerprints(d, 3, 4).count()
    assert(n >= nShingles / 8 && n <= nShingles / 2,
      s"selected $n of $nShingles k-grams (expect ~2/(w+1) = 0.4)")
  }

  test("documents with fewer than w k-grams emit no fingerprints") {
    // 5 tokens -> 3 shingles < w=4
    val d = docs((1L, "a b c d e", "a"), (2L, filler(6, 50), "a"))
    val byDoc = TextAnalysis.winnowFingerprints(d, 3, 4)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byDoc.contains(1L))
    assert(byDoc(2L) > 0L)
  }

  test("winnowCandidates pairs the copies and df-cut drops boilerplate") {
    val boiler = "common header line repeated on every page here now"
    val copied = s"${filler(7, 30)} stolen passage one two three four five"
    val d = docs(
      (1L, s"$boiler $copied", "a"),
      (2L, s"$boiler ${filler(8, 40)}", "a"),
      (3L, s"$boiler ${filler(9, 40)}", "a"),
      (4L, s"$boiler $copied", "a"))
    val pairs = TextAnalysis.winnowCandidates(d, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 4L)), s"copy pair missing: $pairs")
    // the copied span dominates the boilerplate-only pairs
    val copyShared = pairs((1L, 4L))
    pairs.foreach { case (p, n) =>
      if (p != ((1L, 4L))) assert(n <= copyShared, s"$p shares $n > $copyShared")
    }
    // with maxDf = 1 every fingerprint in >1 doc is dropped: no pairs
    assert(TextAnalysis.winnowCandidates(d, maxDf = 1).count() === 0L)
  }

  test("winnowCandidatesIncremental == full pairs restricted to new-touching") {
    val boiler = "shared template header for every page of this corpus"
    val corpus = docs(
      (1L, s"$boiler ${filler(1, 30)}", "a"),
      (2L, s"$boiler ${filler(2, 30)}", "a"),
      (3L, s"$boiler ${filler(1, 30)}", "a"), // copy of 1 (new batch)
      (4L, s"$boiler ${filler(3, 30)}", "a")) // new
    val isNew = (id: Long) => id >= 3L
    val full = TextAnalysis.winnowCandidates(corpus, maxDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val inc = TextAnalysis.winnowCandidatesIncremental(
        TextAnalysis.winnowFingerprints(corpus.where(col("doc_id") >= 3)),
        TextAnalysis.winnowFingerprints(corpus.where(col("doc_id") < 3)),
        maxDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(inc === full.filter { case ((a, b), _) => isNew(a) || isNew(b) })
    assert(inc.contains((1L, 3L)), "the cross-batch copy pair must surface")
    assert(inc.contains((3L, 4L)), "the new-new pair must count once")
  }

  test("million-k-gram documents decode fingerprints exactly (2^32 factor)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one document with > 1e6 k-grams: under the earlier h·1e6+pos
    // encoding every fingerprint selected past position 1e6 decoded to
    // a WRONG (hash, position); the 2^32 factor must keep decode exact.
    // Witness: the same selection with NO encoding at all — a window
    // arg-min over struct(h, pos), whose lexicographic min is the same
    // leftmost-tie contract — must produce the identical (hash, pos)
    // set. Vocabulary of 89 tokens keeps hashes colliding-and-varied.
    val n = 1000012
    val d = docs((1L, (0 until n).map(i => s"t${i % 89}").mkString(" "), "a"))
    val k = 3; val w = 4
    val got = TextAnalysis.winnowFingerprints(d, k, w)
      .select("fp_hash", "fp_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = TextAnalysis.tokenHashTable(d)
      .select(col("doc_id"), TextAnalysis.shingleHashes(col("th"), k).as("hs"))
      .select(col("doc_id"), size(col("hs")).as("n_sh"),
        posexplode(col("hs")).as(Seq("pos", "h0")))
      .withColumn("h",
        (col("h0") * col("h0") + lit(12345L)) % lit(TextAnalysis.HashMod))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    val want = sh
      .withColumn("m",
        min(struct(col("h"), col("pos").cast("long").as("pos"))).over(win))
      .where(col("pos") <= col("n_sh") - w)
      .select(col("m.h"), col("m.pos")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.exists(_._2 >= 1000000L),
      "test must exercise positions past the old 1e6 encoding factor")
  }

  test("sourceOverlap computes exact pairwise shingle Jaccard") {
    val d = docs(
      (1L, "one two three four five", "s1"), // shingles: {123,234,345}
      (2L, "one two three six seven", "s2"), // shares {123}
      (3L, "eight nine ten", "s3")) // disjoint single shingle
    val rows = TextAnalysis.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(rows((Seq("s1", "s2").min, Seq("s1", "s2").max)) ===
      ((1L, 3L, 3L, 1.0 / 5.0)))
    // disjoint sources produce no row (inner pair join)
    assert(!rows.keySet.exists { case (a, b) => a == "s3" || b == "s3" })
  }
}

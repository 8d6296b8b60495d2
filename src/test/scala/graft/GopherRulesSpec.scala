package graft

import graft.text.TextAnalysis

class GopherRulesSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat and the dog ran far away today ok"),
      (2L, "a b"),
      (3L, "")).toDF("doc_id", "text")
  }

  private def run() = TextAnalysis.gopherRules(docs,
    minWords = 5L, maxWords = 100L, minMeanX100 = 300L, maxMeanX100 = 500L,
    minStop = 2L, minLongPct = 85L)
    .collect().map(r => r.getLong(0) -> r).toMap

  test("metrics match the hand computation") {
    val got = run()
    // doc 1: 10 words, 32 chars → 320; stop hits the/and/the = 3;
    // 9 of 10 words ≥ 3 chars → 90%
    assert(got(1L).getLong(1) === 10L)
    assert(got(1L).getLong(2) === 320L)
    assert(got(1L).getLong(3) === 3L)
    assert(got(1L).getLong(4) === 90L)
    // doc 2: 2 words, 2 chars → 100; one stopword; no long words
    assert(got(2L).getLong(1) === 2L)
    assert(got(2L).getLong(2) === 100L)
    assert(got(2L).getLong(3) === 1L)
    assert(got(2L).getLong(4) === 0L)
    // doc 3: the empty-string→1-token split artifact, all-zero metrics
    assert(got(3L).getLong(1) === 1L)
    assert(got(3L).getLong(2) === 0L)
  }

  test("per-rule flags and the keep conjunction") {
    val got = run()
    // row: doc_id, n_words, mean, n_stop, long_pct, words_ok, mean_ok,
    // stop_ok, long_ok, keep
    assert(got(1L).getBoolean(5) && got(1L).getBoolean(6) &&
      got(1L).getBoolean(7) && got(1L).getBoolean(8) && got(1L).getBoolean(9))
    assert(!got(2L).getBoolean(5) && !got(2L).getBoolean(6) &&
      !got(2L).getBoolean(7) && !got(2L).getBoolean(8) && !got(2L).getBoolean(9))
    assert(!got(3L).getBoolean(9))
  }
}

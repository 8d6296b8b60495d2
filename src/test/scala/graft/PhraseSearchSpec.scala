package graft

import graft.text.TextAnalysis

class PhraseSearchSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the cat mat"),
      (2L, "cat the cat"),
      (3L, "cat cat cat")).toDF("doc_id", "text")
  }

  private def search(ps: (String, String)*) = {
    import spark.implicits._
    TextAnalysis.phraseSearch(docs, ps.toDF("query_id", "phrase"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
  }

  test("contiguous matches only, with counts and 1-based first position") {
    val got = search("q" -> "the cat")
    // d1: starts 0 and 4; d2: start 1; d3: no "the"
    assert(got === Map(("q", 1L) -> ((2L, 1L)), ("q", 2L) -> ((1L, 2L))))
  }

  test("a repeated-token phrase counts overlapping occurrences once each") {
    val got = search("q" -> "cat cat")
    // d3 "cat cat cat": starts 0 and 1 (overlap allowed); d1 has no
    // adjacent cats
    assert(got === Map(("q", 3L) -> ((2L, 1L))))
  }

  test("longer phrases and misses") {
    val got = search("a" -> "the cat sat", "b" -> "sat the")
    assert(got === Map(("a", 1L) -> ((1L, 1L))))
  }
}

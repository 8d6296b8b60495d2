package graft

import graft.text.TextAnalysis

class PmiSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq((1L, "new york new york"), (2L, "new york city"), (3L, "the city"))
      .toDF("doc_id", "text")
  }

  test("the collocation survives the floor with the hand-computed PMI") {
    val got = TextAnalysis.pmiCollocations(docs, minCount = 2L).collect()
    assert(got.length === 1)
    val r = got.head
    // (new, york): 3 of 6 bigrams; new 3/9 tokens, york 3/9 →
    // pmi = ln(0.5 / (1/9)) = ln 4.5 → 1504077 at 1e-6
    assert((r.getString(0), r.getString(1), r.getLong(2)) === (("new", "york", 3L)))
    assert(r.getLong(3) === math.floor(math.log(4.5) * 1e6).toLong)
  }

  test("dropping the support floor admits every observed bigram") {
    val got = TextAnalysis.pmiCollocations(docs, minCount = 1L).collect()
    assert(got.length === 4)
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("new", "york"), ("york", "new"), ("york", "city"), ("the", "city")))
  }
}

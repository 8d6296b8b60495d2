package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("rollingHash matches a straight-line scala fold (per codepoint)") {
    def ref(s: String): Long =
      s.codePoints().toArray
        .foldLeft(0L)((acc, cp) => (acc * 31 + cp) % TextAnalysis.HashMod)
    val texts = Seq("", "a", "hello world", "The quick brown fox!",
      "héllo wörld", "emoji 💩 pair 😀 end")
    val d = docs(texts.zipWithIndex.map { case (t, i) => i.toLong -> t }: _*)
    val got = d.select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) => assert(got(i.toLong) === ref(t), s"text '$t'") }
  }

  test("native RollingHash expression == HOF formulation, incl. in lambdas") {
    // includes non-BMP text: codePointAt iteration in the native
    // expression must agree with the HOF's split("")+ascii per-codepoint
    // fold even when a character is a surrogate pair
    val d = docs(1L -> "hello world split test", 2L -> "", 3L -> "Ünïcödé bmp",
      4L -> "non-bmp 💩😀 𝄞 clef")
    val flat = d.select(
        TextAnalysis.rollingHash(col("text")).as("native"),
        TextAnalysis.rollingHashHof(col("text")).as("hof"))
      .collect()
    flat.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // inside a transform lambda (the hot path in tokenHashTable)
    val lam = d.select(
        transform(split(col("text"), " "), t => TextAnalysis.rollingHash(t)).as("n"),
        transform(split(col("text"), " "), t => TextAnalysis.rollingHashHof(t)).as("h"))
      .collect()
    lam.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("native ShingleHashes == HOF formulation across widths") {
    val d = docs(1L -> "a b c d e f g", 2L -> "one two", 3L -> "solo", 4L -> "")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = d.select(
          TextAnalysis.shingleHashes(
            transform(TextAnalysis.tokens(col("text")), t => TextAnalysis.rollingHash(t)), n)
            .as("native"),
          TextAnalysis.shingleHashesHof(
            transform(TextAnalysis.tokens(col("text")), t => TextAnalysis.rollingHash(t)), n)
            .as("hof"))
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n"))
    }
  }

  test("tokenStats counts whitespace tokens and distinct tokens") {
    val d = docs(1L -> "a b  b c", 2L -> "")
    val out = TextAnalysis.tokenStats(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((4L, 3L)))
    assert(out(2L)._1 === 1L) // split("") yields [""] — documented edge
  }

  test("repetitionStats computes top/dup token and bigram fractions") {
    // "a a a b": 4 tokens, 2 distinct, top 'a'×3 → 0.75; 3 of 4
    // instances are of a repeated token → 0.75. Bigrams (a,a),(a,a),
    // (a,b): 3 grams, top 2/3, dup 2/3. "x": one token, no bigrams →
    // NULL n-gram columns.
    val d = docs(1L -> "a a a b", 2L -> "x")
    val out = TextAnalysis.repetitionStats(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert((r1.getLong(1), r1.getLong(2)) === ((4L, 2L)))
    assert(r1.getDouble(3) === 0.75 && r1.getDouble(4) === 0.75)
    assert(r1.getLong(5) === 3L)
    assert(math.abs(r1.getDouble(6) - 2.0 / 3.0) < 1e-15)
    assert(math.abs(r1.getDouble(7) - 2.0 / 3.0) < 1e-15)
    val r2 = out(2L)
    assert((r2.getLong(1), r2.getLong(2)) === ((1L, 1L)))
    assert(r2.getDouble(3) === 1.0 && r2.getDouble(4) === 0.0)
    assert(r2.isNullAt(5) && r2.isNullAt(6) && r2.isNullAt(7))
  }

  test("piiScan counts emails, phones, urls, ipv4 and flags has_pii") {
    val d = docs(
      1L -> "contact me at jane.doe+test@example.co.uk or bob@x.io today",
      2L -> "call +1 (555) 123-4567 now; server at 10.0.42.7 works",
      3L -> "see https://example.com/a?b=1 and http://x.org",
      4L -> "perfectly clean prose with number 42 only")
    val out = TextAnalysis.piiScan(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap
    assert(out(1L) === ((2L, 0L, 0L, 0L, true)))
    assert(out(2L)._2 === 1L && out(2L)._4 === 1L && out(2L)._5)
    assert(out(3L)._3 === 2L && out(3L)._5)
    assert(out(4L) === ((0L, 0L, 0L, 0L, false)))
  }

  test("contaminationScan finds probe trigram overlap via broadcast semi-join") {
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon", // contains probe trigram twice-ish
      2L -> "zeta eta theta iota kappa")      // disjoint
    val probes = docs(100L -> "beta gamma delta")
    val out = TextAnalysis.contaminationScan(corpus, probes, n = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // doc 1: trigrams (a,b,g)(b,g,d)(g,d,e) — exactly (b,g,d) matches
    assert(out(1L) === ((3L, 1L, true)))
    assert(out(2L) === ((3L, 0L, false)))
  }

  test("tfidfTopK ranks corpus-rare frequent tokens first, k-capped, tok tie-break") {
    val d = docs(
      1L -> "apple banana apple apple common",
      2L -> "banana cherry common",
      3L -> "cherry common date")
    val out = TextAnalysis.tfidfTopK(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 2))
    // doc 1: apple tf=3 df=1 score=floor(3*ln(2)*100)=207 beats
    // banana tf=1 df=2 score=floor(ln(4/3)*100)=28 beats common (df=3, 0)
    val d1 = byDoc(1L).sortBy(_._2)
    assert(d1.map(t => (t._3, t._4, t._5)).toSeq ===
      Seq(("apple", 3L, 1L), ("banana", 1L, 2L)))
    // doc 3: cherry (df=2) ranks above date?? date df=1 ln(2)=69 > cherry 28
    val d3 = byDoc(3L).sortBy(_._2)
    assert(d3.head._3 === "date")
    assert(d3(1)._3 === "cherry")
    // equal scores fall back to token order: doc 2 banana/cherry both
    // tf=1 df=2 → banana first
    val d2 = byDoc(2L).sortBy(_._2)
    assert(d2.map(_._3).toSeq === Seq("banana", "cherry"))
  }

  test("native TokenCount == size(split(trim, \\s+)) on edge cases and random text") {
    val edge = Seq("", " ", "   \t\n ", "a", " a ", "a  b", "a\tb\nc\rd\fe",
      "a b",          // NBSP is NOT \s — one token
      "xy",          // vertical tab IS \s — two tokens
      "emoji 💩  pair\t😀", "多字 节  文本")
    val rnd = new scala.util.Random(7)
    val alphabet = "ab \t\n九💩"
    val random = Seq.fill(200)(
      Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val d = docs((edge ++ random).zipWithIndex.map { case (t, i) => i.toLong -> t }: _*)
    val out = d.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("native"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("split_based"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"doc ${r.getLong(0)}: native ${r.getLong(1)} != split ${r.getLong(2)}")
    }
  }

  test("native TokenHashes == transform(split(trim, \\s+), rollingHash) on edge cases") {
    // the r13 one-pass expression must replay EVERY split artifact the
    // HOF pipeline has: space-only trim, leading/trailing empty fields
    // (hash 0), the empty-string [""] artifact, non-BMP code points
    val edge = Seq("", " ", "   \t\n ", "a", " a ", "a  b", "a\tb\nc\rd\fe",
      "\ta", "a\t", " \ta\t ", "a b", "xy",
      "emoji 💩  pair\t😀", "多字 节  文本")
    val rnd = new scala.util.Random(13)
    val alphabet = "ab \t\n九💩"
    val random = Seq.fill(200)(
      Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val d = docs((edge ++ random).zipWithIndex.map { case (t, i) => i.toLong -> t }: _*)
    val out = d.select(col("doc_id"),
        graft.expressions.TokenHashes(col("text")).as("native"),
        transform(TextAnalysis.tokens(col("text")),
          t => TextAnalysis.rollingHash(t)).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Long](1)} != hof ${r.getSeq[Long](2)}")
    }
  }

  test("chunkDocuments windows cover every token, clipped tail, short docs = 1 chunk") {
    val d = docs(
      1L -> (1 to 10).map(i => s"t$i").mkString(" "), // 10 tokens, w=4 s=2
      2L -> "a b",                                     // shorter than window
      3L -> "")                                        // empty → [""] artifact
    val out = TextAnalysis.chunkDocuments(d, window = 4, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 10 tokens: chunks start 0,2,4,6 → 1 + ceil((10-4)/2) = 4 chunks
    assert(d1.length === 4)
    assert(d1.map(c => (c._3, c._4)).toSeq === Seq((0L, 4L), (2L, 6L), (4L, 8L), (6L, 10L)))
    assert(d1.head._5 === "t1 t2 t3 t4")
    assert(d1.last._5 === "t7 t8 t9 t10")
    // every token index [0,10) is covered by at least one chunk
    val covered = d1.flatMap(c => c._3 until c._4).toSet
    assert(covered === (0L until 10L).toSet)
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 2L, "a b")))
    assert(out.filter(_._1 == 3L).map(c => (c._2, c._3, c._4, c._5)).toSeq ===
      Seq((0L, 0L, 1L, "")))
  }

  test("perplexityScore: hand-computed add-one bigram NLL, short docs dropped") {
    val d = docs(1L -> "a b a b", 2L -> "b a", 3L -> "x")
    // bigrams: d1 (a,b)(b,a)(a,b), d2 (b,a) → c(a,b)=2, c(b,a)=2,
    // c(a,·)=2, c(b,·)=2; vocab {a,b,x} → V=3
    // every observed bigram: P = (2+1)/(2+3) = 0.6
    val term = math.floor(-math.log(3.0 / 5.0) * 1e6).toLong
    val out = TextAnalysis.perplexityScore(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((3L, 3L * term)))
    assert(out(2L) === ((1L, term)))
    assert(!out.contains(3L), "single-token docs have no bigrams")
  }

  test("knBigramScore: hand-computed Kneser-Ney terms and the continuation property") {
    val d = docs(1L -> "a b", 2L -> "a b", 3L -> "a c")
    // c(a,b)=2 c(a,c)=1; c(a,·)=3; T(a)=2; N(b)=N(c)=1; B=2
    // P(b|a) = [(4·2−3)·2 + 3·2·1] / (4·3·2) = 16/24 = 2/3
    // P(c|a) = [(4·1−3)·2 + 3·2·1] / 24     =  8/24 = 1/3
    val tb = math.floor(-math.log(16.0 / 24.0) * 1e6).toLong
    val tc = math.floor(-math.log(8.0 / 24.0) * 1e6).toLong
    val out = TextAnalysis.knBigramScore(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(1L -> ((1L, tb)), 2L -> ((1L, tb)), 3L -> ((1L, tc))))
    // the "Francisco" property: a frequent-but-single-context token is
    // PENALIZED relative to a rarer diverse-context token when scored
    // after a fresh context — here both y-bigrams share counts with the
    // francisco one except the continuation count N(w2)
    val d2 = docs(1L -> "san francisco", 2L -> "san francisco",
      3L -> "san francisco", 4L -> "x y", 5L -> "z y")
    val out2 = TextAnalysis.knBigramScore(d2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // N(francisco)=1 though c=3; N(y)=2: the y docs score BETTER than
    // frequency alone would predict relative to their count-1 bigrams
    assert(out2(4L) === out2(5L))
    assert(out2(1L) < out2(4L), "3× bigram still beats count-1 bigrams")
  }

  test("charEntropy: floored-term replay, uniform and degenerate docs") {
    val d = docs(1L -> "aab", 2L -> "zzzz", 3L -> "abcd")
    def ref(text: String): Long = {
      val counts = text.groupBy(identity).values.map(_.length.toLong)
      val n = text.length.toLong
      val st = counts.map(c =>
        c * math.floor(math.log(c.toDouble / n) * 1e6).toLong).sum
      val pm = ((st % n) + n) % n
      -((st - pm) / n)
    }
    val out = TextAnalysis.charEntropy(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((2L, 3L, ref("aab"))))
    // single repeated char: zero entropy exactly
    assert(out(2L) === ((1L, 4L, 0L)))
    // uniform 4 classes: ln 4 (floored)
    assert(out(3L) === ((4L, 4L, ref("abcd"))))
    assert(out(3L)._3 > out(1L)._3 && out(1L)._3 > out(2L)._3)
  }

  test("typeTokenRatio: exact ppm and the hapax tail") {
    val d = docs(1L -> "a b a c", 2L -> "x x x x")
    val out = TextAnalysis.typeTokenRatio(d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(1L) === ((4L, 3L, 2L, 750000L, 500000L)))
    assert(out(2L) === ((4L, 1L, 0L, 250000L, 0L)))
  }

  test("lengthQuantiles computes exact interpolated percentiles per group") {
    import spark.implicits._
    val d = Seq(
      (1L, "en", "a b c"),        // 3 tokens
      (2L, "en", "a b c d e"),    // 5
      (3L, "en", "a"),            // 1
      (4L, "de", "x y"))          // 2
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.lengthQuantiles(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // en tokens sorted: 1,3,5 → p50 lands exactly on 3; p99 interpolates
    // between 3 and 5 — compute the expectation with the same double
    // arithmetic the engines use (hardcoding 496 vs 495 is ulp-fragile)
    val frac = 0.99 * 2 - 1.0
    val exp99 = math.floor((3.0 + (5.0 - 3.0) * frac) * 100.0).toLong
    assert(out("en") === ((3L, 300L, exp99)))
    assert(out("de")._2 === 200L)
  }

  test("shingles produces n-token windows, distinct, empty when short") {
    val d = docs(1L -> "a b c d", 2L -> "a b")
    val out = d.select(col("doc_id"), TextAnalysis.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).toSet === Set("a b c", "b c d"))
    assert(out(2L).isEmpty)
  }

  test("langId votes marker tokens, und when none") {
    val d = docs(
      1L -> "the cat and the dog is a pet",
      2L -> "der hund und die katze ist das",
      3L -> "zzz qqq www")
    val out = TextAnalysis.langId(d).collect()
      .map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "und")
  }

  test("qualityScore ratios are in range and quality in [0,1]") {
    val d = docs(1L -> "Clean simple text with several plain words here",
      2L -> "!!! ??? ### $$$ %%%")
    val rows = TextAnalysis.qualityScore(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(6))).toMap
    val (punct1, q1) = rows(1L)
    val (punct2, q2) = rows(2L)
    assert(punct1 === 0.0)
    assert(punct2 > 0.5)
    assert(q1 > q2)
    rows.values.foreach { case (p, q) =>
      assert(p >= 0.0 && p <= 1.0); assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("contaminationReport: leaked fraction per probe, unseen probes at 0") {
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five six")
    val probes = docs(
      10L -> "alpha beta gamma delta epsilon", // fully leaked (copy of doc 1)
      11L -> "nothing here matches corpus text at all",
      12L -> "zz yy one two three four xx ww") // partial: "one two three","two three four"
    val out = TextAnalysis.contaminationReport(corpus, probes)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(10L) === ((3L, 3L, 1L, 1.0)))
    assert(out(11L)._2 === 0L)
    assert(out(11L)._4 === 0.0)
    assert(out(12L) === ((6L, 2L, 1L, 2.0 / 6.0)))
  }

  test("buildVocab: frequency-ranked dense ids, token tie-break, hard cut") {
    val d = docs(
      1L -> "b b b a a c",
      2L -> "a b z")
    // counts: b=4, a=3, z=1, c=1 → ids b:0 a:1 c:2 z:3 (count desc,
    // token asc on the tie)
    val full = TextAnalysis.buildVocab(d, maxVocab = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(full === Map("b" -> ((4L, 0L)), "a" -> ((3L, 1L)),
      "c" -> ((1L, 2L)), "z" -> ((1L, 3L))))
    // the cut keeps exactly the top-V by the same ordering
    val cut = TextAnalysis.buildVocab(d, maxVocab = 2)
      .collect().map(_.getString(0)).toSet
    assert(cut === Set("b", "a"))
  }

  test("oovStats counts instances outside the vocab, skips empty docs") {
    import spark.implicits._
    val d = docs(
      1L -> "a b a q",  // q is OOV → 1/4
      2L -> "q r",      // all OOV → 2/2
      3L -> "a b",      // none OOV
      4L -> "")         // no tokens → no row
    val vocab = Seq("a", "b").toDF("token")
    val out = TextAnalysis.oovStats(d, vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out === Map(
      1L -> ((4L, 1L, 0.25)),
      2L -> ((2L, 2L, 1.0)),
      3L -> ((2L, 0L, 0.0))))
  }

  test("invertedIndex: tf, first_pos, df/cf lexicon, hapax pruning") {
    val d = docs(
      1L -> "to be or not to be",
      2L -> "be quick",
      3L -> "or else")
    val flat = TextAnalysis.invertedIndex(d, minDf = 2L)
      .collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("doc_id")) ->
        ((r.getAs[Long]("tf"), r.getAs[Long]("first_pos"),
          r.getAs[Long]("df"), r.getAs[Long]("cf"))))
      .toMap
    assert(flat === Map(
      ("be", 1L) -> ((2L, 2L, 2L, 3L)),
      ("be", 2L) -> ((1L, 1L, 2L, 3L)),
      ("or", 1L) -> ((1L, 3L, 2L, 2L)),
      ("or", 3L) -> ((1L, 1L, 2L, 2L))),
      "df=1 tokens (to/not/quick/else) must be pruned; positions 1-based")
  }

  test("postingsLists face explodes back to the flat index") {
    val d = docs(
      1L -> "x y x z",
      2L -> "y z z",
      3L -> "x q")
    val flat = TextAnalysis.invertedIndex(d, minDf = 2L)
      .select("token", "doc_id", "tf", "first_pos", "df", "cf")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val lists = TextAnalysis.postingsLists(d, minDf = 2L)
    val exploded = lists
      .select(col("token"), col("df"), col("cf"),
        explode(col("postings")).as("p"))
      .select(col("token"), col("p.doc_id"), col("p.tf"), col("p.first_pos"),
        col("df"), col("cf"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(exploded === flat)
    // postings arrays are doc_id-sorted (shard-contiguity contract)
    lists.collect().foreach { r =>
      val ids = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("postings")
        .map(_.getAs[Long]("doc_id"))
      assert(ids.toSeq === ids.toSeq.sorted, s"postings not sorted for ${r.get(0)}")
    }
  }

  test("searchAll: conjunctive semantics — every term or nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta"), (3L, "alpha gamma"),
      (4L, "beta gamma alpha alpha"), (5L, "delta alpha beta")).toDF("doc_id", "text")
    val idx = graft.text.TextAnalysis.invertedIndex(docs, minDf = 1L)
    val queries = Seq((1L, "alpha"), (1L, "beta"), (1L, "gamma"),
      (2L, "delta"), (2L, "beta")).toDF("query_id", "token")
    val got = graft.text.TextAnalysis.searchAll(idx, queries)
      .as[(Long, Long, Long)].collect().toSet
    // q1 needs all of alpha+beta+gamma: docs 1 and 4 (4 has tf sum 4)
    // q2 needs delta+beta: doc 5 only
    assert(got === Set((1L, 1L, 3L), (1L, 4L, 4L), (2L, 5L, 2L)))
  }

  test("moreLikeThis: rare shared tokens drive rank; df cut removes stopwords") {
    import spark.implicits._
    // "the" appears everywhere (df 4 > maxDf 3 → no signal); docs 1/2
    // share two rare tokens, 1/3 share one
    val docs = Seq(
      (1L, "the zebra quokka"), (2L, "the zebra quokka"),
      (3L, "the zebra"), (4L, "the llama")).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis
      .moreLikeThis(docs, k = 2, maxDf = 3L, minDf = 1L)
      .select("doc_id", "doc_id_sim", "rank").as[(Long, Long, Long)]
      .collect().groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(got(1L) === Seq(2L, 3L), s"doc 1 neighbors: $got")
    assert(got(2L) === Seq(1L, 3L))
    assert(got(3L) === Seq(1L, 2L))
    assert(!got.contains(4L), "llama shares only the stopword — no pairs")
  }

  test("zipfFit: power-law frequencies slope negative, flat frequencies slope zero") {
    import spark.implicits._
    // zipf-ish lang: token i repeated 2^(8-i) times -> log2 freq = 8-i
    // exactly, log2 rank = floor(log2(i+1)); flat lang: all freq 4
    val zipfText = (0 until 8).flatMap(i =>
      Seq.fill(1 << (8 - i))(s"z${i}t")).mkString(" ")
    val flatText = (0 until 8).flatMap(i => Seq.fill(4)(s"f${i}t")).mkString(" ")
    val docs = Seq((1L, zipfText, "zipf"), (2L, flatText, "flat"))
      .toDF("doc_id", "text", "lang")
    val fits = graft.text.TextAnalysis.zipfFit(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Any]("slope")).toMap
    assert(fits("zipf").asInstanceOf[Double] < -0.5,
      s"power law must slope steeply negative: $fits")
    assert(fits("flat").asInstanceOf[Double] === 0.0,
      s"uniform frequencies must be flat: $fits")
  }

  test("heapsCurve: power-of-two prefixes accumulate tokens and first-seen types") {
    import spark.implicits._
    // doc 0 (bucket k=0): 3 tokens, 2 types; doc 1-2 (k=1): reuse 'a',
    // add 'c','d'; doc 3 (k=2): all repeats -> no new types
    val docs = Seq(
      (0L, "a b a"), (1L, "a c"), (2L, "d"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.heapsCurve(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) === ((3L, 2L)), "after doc 0: 3 tokens, {a,b}")
    assert(got(1L) === ((6L, 4L)), "after docs 0-2: 6 tokens, {a,b,c,d}")
    assert(got(2L) === ((10L, 4L)), "doc 3 adds tokens but no types")
  }

  test("crossPerplexity: reference dialect scores better; unseen bigrams floor") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat", "en"), (2L, "the cat sat", "en"),
      (3L, "voila le chat", "fr")) // all bigrams unseen in the en model
      .toDF("doc_id", "text", "lang")
    val got = graft.text.TextAnalysis
      .crossPerplexity(docs, docs.where($"lang" === "en"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    // per-bigram mean NLL: the in-distribution docs beat the unseen one
    val mean = (id: Long) => got(id)._2.toDouble / got(id)._1
    assert(mean(1L) < mean(3L), s"en doc must score better: $got")
    // every fr bigram hits the Laplace floor -ln(1/V), V = 3 en types
    assert(got(3L)._2 === 2L * math.floor(math.log(3.0) * 1e6).toLong)
  }

  test("noveltyScores: first doc fully novel, copy fully stale, overlap partial") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), // 4 shingles, all novel
      (2L, "a b c d e f"), // exact copy: novelty 0
      (3L, "a b c d x y z")) // shares shingles abc,bcd with doc 1
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.noveltyScores(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((4L, 4L)))
    assert(got(2L) === ((4L, 0L)))
    // doc 3: shingles abc,bcd,cdx,dxy,xyz -> 3 novel of 5
    assert(got(3L) === ((5L, 3L)))
  }

  test("cdcChunks partitions the k-gram stream; short docs emit nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 40).map(i => s"tok${i % 13}").mkString(" ")),
      (2L, "a b")) // fewer than k=3 tokens: no k-gram, no chunks
      .toDF("doc_id", "text")
    val ch = graft.text.TextAnalysis.cdcChunks(docs).collect()
    assert(!ch.exists(_.getLong(0) == 2L), "sub-k doc emits no chunks")
    val d1 = ch.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // chunk ids contiguous from 0; chunks tile the 38 k-gram positions
    assert(d1.map(_._1).toSeq === d1.indices.map(_.toLong))
    assert(d1.map(_._3).sum === 38L, "chunks partition every position")
    assert(d1.head._2 === 0L, "first chunk starts at position 0")
    // consecutive starts advance by exactly the previous chunk's size
    d1.sliding(2).foreach {
      case Array((_, s1, n1), (_, s2, _)) => assert(s2 === s1 + n1)
      case _ =>
    }
  }

  test("cdcChunks resynchronizes after an edit (fixed-stride does not)") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w${(i * 7) % 23}")
    val docs = Seq(
      (1L, base.mkString(" ")),
      // one token PREPENDED: every token position shifts by one
      (2L, ("INS" +: base).mkString(" ")))
      .toDF("doc_id", "text")
    val ch = graft.text.TextAnalysis.cdcChunks(docs).collect()
      .groupBy(_.getLong(0))
    val h1 = ch(1L).map(_.getLong(4)).toSet
    val h2 = ch(2L).map(_.getLong(4)).toSet
    // boundaries are content-keyed, so past the first post-edit cut the
    // chunking realigns and the untouched suffix reproduces identical
    // chunk hashes — the property chunk-level dedup depends on
    assert((h1 intersect h2).nonEmpty,
      s"edited doc must share suffix chunks, got $h1 vs $h2")
  }

  test("ngramDiversity: looping slice scores low, diverse slice high") {
    import spark.implicits._
    // group A loops one bigram; group B is all-distinct tokens
    val d = Seq(
      (1L, "A", "x y x y x y x y"),   // 8 tokens: 2 distinct
      (2L, "B", "a b c d e f g h"))   // 8 tokens: 8 distinct
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.ngramDiversity(d).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // A unigrams: 8 total, {x, y} distinct -> ratio 0.25
    assert(got(("A", 1)) === ((8L, 2L, 250000L)))
    // A bigrams: 7 total, {xy, yx} distinct -> floor(2e6/7)
    assert(got(("A", 2)) === ((7L, 2L, 285714L)))
    // A trigrams: 6 total, {xyx, yxy} -> floor(2e6/6)
    assert(got(("A", 3)) === ((6L, 2L, 333333L)))
    // B: everything distinct at every n -> ratio exactly 1.0
    assert(got(("B", 1)) === ((8L, 8L, 1000000L)))
    assert(got(("B", 2)) === ((7L, 7L, 1000000L)))
    assert(got(("B", 3)) === ((6L, 6L, 1000000L)))
  }

  test("jsDivergence: identical slices ~0, disjoint slices = ln 2") {
    import spark.implicits._
    val same = Seq((0L, "a b c", "x"), (1L, "a b c", "y"))
      .toDF("doc_id", "text", "lang")
    val gotSame = TextAnalysis.jsDivergence(same)
      .select("jsd_s").as[Long].collect().head
    // identical distributions: every ratio is exactly 1, ln 1 = 0,
    // floors exact → 0 (not merely small)
    assert(gotSame === 0L)
    // fully disjoint vocabularies: every word has ratio 2 on its own
    // side → JSD = ln 2 → floor(ln 2 · 1e6) with two floor-div halves
    val disjoint = Seq((0L, "a a b", "x"), (1L, "c d e f", "y"))
      .toDF("doc_id", "text", "lang")
    val gotDis = TextAnalysis.jsDivergence(disjoint)
      .select("jsd_s").as[Long].collect().head
    val ln2 = math.floor(math.log(2.0) * 1e6).toLong // 693147
    // each half contributes floor-div(n·flog2, 2n) = flog2/2 with
    // floor rounding; allow the 1-unit floor slack
    assert(gotDis >= ln2 - 2 && gotDis <= ln2)
  }

  test("jsDivergence: hand-computed asymmetric pair") {
    import spark.implicits._
    // slice x: {a:2, b:1} n=3; slice y: {a:1, c:1} n=2
    val docs = Seq((0L, "a a b", "x"), (1L, "a c", "y"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.jsDivergence(docs)
      .as[(String, String, Long, Long, Long)].collect().head
    def flog(num: Long, den: Long): Long =
      math.floor(math.log(num.toDouble / den.toDouble) * 1e6).toLong
    // ratio_a(w) = 2·ca·nb/(ca·nb+cb·na); na=3, nb=2
    val sta = 2 * flog(2 * 2 * 2, 2 * 2 + 1 * 3) + // a: ca=2, cb=1
      1 * flog(2 * 1 * 2, 1 * 2 + 0)               // b: ca=1, cb=0
    val stb = 1 * flog(2 * 1 * 3, 2 * 2 + 1 * 3) + // a: cb=1
      1 * flog(2 * 1 * 3, 0 + 1 * 3)               // c: cb=1
    def fdiv(x: Long, d: Long): Long = Math.floorDiv(x, d)
    assert(got === (("x", "y", 3L, 2L, fdiv(sta, 6) + fdiv(stb, 4))))
  }
}

package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.analytics.Coverages
import graft.defrag.Defrag

/** Seeded randomized properties (SURVEY.md §5.2). All cases for one
  * property run as ONE Spark job (union'd input) so the suite stays
  * fast; seeds are fixed so failures reproduce.
  */
class PropertySpec extends SparkTestBase {

  import spark.implicits._

  test("islands: covered length == brute-force union, bounded by span") {
    val rnd = new Random(7)
    // 200 groups of up to 12 random intervals
    val rows = for {
      g <- 1 to 200
      _ <- 1 to (1 + rnd.nextInt(12))
      s = rnd.nextInt(1000)
      len = 1 + rnd.nextInt(120)
    } yield (g.toLong, s, s + len)
    val df = rows.toDF("g", "s", "e")
    val got = Coverages.islandStats(df, Seq("g"), "s", "e", "n_islands", "covered")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    def brute(iv: Seq[(Int, Int)]): (Long, Long) = {
      // merge sorted intervals with the reference's prev_end+1 rule
      val sorted = iv.sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, (s, e)) => List((s, e))
        case ((cs, ce) :: rest, (s, e)) =>
          if (ce + 1 >= s) (cs, math.max(ce, e)) :: rest
          else (s, e) :: (cs, ce) :: rest
      }
      (merged.size.toLong, merged.map { case (s, e) => (e - s).toLong }.sum)
    }
    rows.groupBy(_._1).foreach { case (g, iv) =>
      val expected = brute(iv.map { case (_, s, e) => (s, e) })
      assert(got(g) === expected, s"group $g: intervals ${iv.sortBy(_._2)}")
      val span = iv.map(_._3).max - iv.map(_._2).min
      assert(got(g)._2 <= span)
    }
  }

  test("defrag: UDAF == straight-line oracle on random documents") {
    val rnd = new Random(13)
    val pieces = (1L to 400L).map { id =>
      val doc = 1 + rnd.nextInt(8)
      val s = rnd.nextInt(2000)
      (id, doc.toLong, s, s + 5 + rnd.nextInt(400))
    }
    val got = Defrag.rawMappings(pieces.toDF("piece_id", "trs_id", "trs_start", "trs_end"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = pieces.groupBy(_._2).flatMap { case (_, doc) =>
      Defrag.scanDocument(doc.map { case (id, _, s, e) => (s, e, id) }
        .sortBy { case (s, _, id) => (s, id) })
    }
    assert(got === want)
    // structural properties: same-document mapping, start within 180
    val byId = pieces.map(p => p._1 -> p).toMap
    got.foreach { case (orig, rep) =>
      assert(byId(orig)._2 === byId(rep)._2, s"$orig mapped across documents")
      assert(math.abs(byId(orig)._3 - byId(rep)._3) <= 180)
    }
  }

  test("dedupGroups with rounds >= diameter == exact connected components") {
    val rnd = new Random(13)
    // random sparse graph on 60 nodes: ~70 edges → several components
    val nodes = (1L to 60L)
    val edges = (1 to 70).map { _ =>
      (1L + rnd.nextInt(60), 1L + rnd.nextInt(60))
    }.filter(e => e._1 != e._2).distinct
    // exact components by BFS over the same edges
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val label = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    nodes.foreach { start =>
      // flood the component's min node id
      val seen = scala.collection.mutable.Set(start)
      val queue = scala.collection.mutable.Queue(start)
      while (queue.nonEmpty) {
        val n = queue.dequeue()
        adj.getOrElse(n, Nil).foreach { m =>
          if (!seen(m)) { seen += m; queue += m }
        }
      }
      val mn = seen.min
      seen.foreach(n => label(n) = math.min(label(n), mn))
    }
    // 60 nodes → diameter < 60; rounds = 60 is always enough
    val docs = nodes.toSeq.toDF("doc_id").select(col("doc_id"), lit("t").as("text"))
    val pairs = edges.toDF("doc_id_a", "doc_id_b")
    val got = graft.dedup.Dedup.dedupGroups(docs, pairs, rounds = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === label.toMap)
  }

  test("repeatedSpans == brute-force gram count + span merge on random corpora") {
    val rnd = new Random(21)
    // a 4-token vocabulary over 40 docs (≤64 distinct 3-grams vs ~600
    // occurrences) guarantees corpus-frequent grams AND rare ones
    val corpus = (1L to 40L).map { id =>
      val n = 3 + rnd.nextInt(28)
      id -> Seq.fill(n)("t" + rnd.nextInt(4)).mkString(" ")
    }
    val got = graft.dedup.Dedup.repeatedSpans(corpus.toDF("doc_id", "text"),
        n = 3, minCount = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // brute force over token STRINGS (the engine works on hashes; a
    // collision between distinct grams mod 1e9+7 would fail this)
    val occ = corpus.flatMap { case (id, t) =>
      val toks = t.split(" ")
      (0 to toks.length - 3).map(i => (id, i, toks.slice(i, i + 3).toSeq))
    }
    val counts = occ.groupBy(_._3).map { case (g, os) => g -> os.size }
    val hits = occ.filter(o => counts(o._3) >= 4).map(o => (o._1, o._2, o._2 + 2))
    val want = hits.groupBy(_._1).flatMap { case (id, hs) =>
      val sorted = hs.map(h => (h._2, h._3)).sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, (s, e)) => List((s, e))
        case ((cs, ce) :: rest, (s, e)) =>
          if (s <= ce + 1) (cs, math.max(ce, e)) :: rest
          else (s, e) :: (cs, ce) :: rest
      }
      merged.map { case (s, e) => (id, s.toLong, e.toLong, (e - s + 1).toLong) }
    }.toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture must produce repeated spans")
  }

  test("shuffleToShards spreads a sequential keyspace near-uniformly") {
    // sequential ids are the common (worst) input — the multiplicative
    // hash must still balance shards, or one output file gets the corpus
    val d = (1L to 2000L).toDF("doc_id")
    val sizes = graft.sampling.Sampling.shuffleToShards(d, "doc_id", nShards = 8, salt = 5)
      .groupBy("shard").count().collect().map(r => r.getLong(1))
    assert(sizes.length === 8, "every shard must receive rows")
    assert(sizes.max.toDouble / sizes.min <= 1.5,
      s"shard skew too high: ${sizes.mkString(",")}")
  }

  test("coverage percentages stay in [0,100] when lengths cover offsets") {
    val rnd = new Random(29)
    val tr = (1 to 300).map { _ =>
      val (t1, t2) = (rnd.nextInt(20).toLong, (100 + rnd.nextInt(20)).toLong)
      val (s1, s2) = (rnd.nextInt(900), rnd.nextInt(900))
      (t1, t2, s1, s1 + 1 + rnd.nextInt(100), s2, s2 + 1 + rnd.nextInt(100))
    }.toDF("trs1_id", "trs2_id", "trs1_start", "trs1_end", "trs2_start", "trs2_end")
    val lengths = ((0L until 20L) ++ (100L until 120L)).toDF("trs_id")
      .select(col("trs_id"), lit(1000).as("text_length"))
    val rows = Coverages.coverages(tr, lengths).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c1, c2) = (r.getDouble(6), r.getDouble(7))
      assert(c1 >= 0.0 && c1 <= 100.0, r.toString)
      assert(c2 >= 0.0 && c2 <= 100.0, r.toString)
    }
  }

  test("BPE training == straight-line reference trainer on random corpora") {
    // Independent in-memory implementation of the SAME contract —
    // per-round global pair count, (count desc, pair asc) winner,
    // greedy leftmost merge — driven over small random corpora with a
    // repeat-heavy vocabulary (2 symbols) so same-symbol runs and ties
    // are constantly exercised. Symbols are compared as HASHES (the
    // engine's alphabet), derived with the same rolling hash.
    val rnd = new Random(33)
    def hash(tok: String): Long =
      tok.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)

    def refMerge(seq: List[Long], a: Long, b: Long, m: Long): List[Long] = {
      val out = scala.collection.mutable.ListBuffer.empty[Long]
      var i = 0
      while (i < seq.length) {
        if (i + 1 < seq.length && seq(i) == a && seq(i + 1) == b) {
          out += m; i += 2
        } else { out += seq(i); i += 1 }
      }
      out.toList
    }

    def refTrain(corpus: Map[Long, List[Long]], rounds: Int)
        : (List[(Long, Long, Long, Long)], Map[Long, List[Long]]) = {
      var state = corpus
      val merges = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
      var r = 0
      var done = false
      while (r < rounds && !done) {
        val pairs = state.values.toList.flatMap(s => s.zip(s.drop(1)))
        if (pairs.isEmpty) done = true
        else {
          val ((a, b), c) = pairs.groupBy(identity).view.mapValues(_.size).toList
            .maxBy { case ((a, b), c) => (c, -a, -b) } // count desc, pair asc
          val m = graft.text.Bpe.MergeSymBase + r
          merges += ((a, b, c.toLong, m))
          state = state.map { case (id, s) => id -> refMerge(s, a, b, m) }
        }
        r += 1
      }
      (merges.toList, state)
    }

    for (trial <- 0 until 4) {
      val corpus = (1L to 25L).map { id =>
        val n = 1 + rnd.nextInt(12)
        id -> List.fill(n)("w" + rnd.nextInt(2))
      }.toMap
      val docsDf = corpus.toSeq.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val (gotMerges, gotState) = graft.text.Bpe.train(docsDf, rounds = 3)
      val (wantMerges, wantState) =
        refTrain(corpus.map { case (id, ts) => id -> ts.map(hash) }, rounds = 3)
      assert(gotMerges.map(m => (m.symA, m.symB, m.pairCount, m.newSym)) ===
        wantMerges, s"trial $trial merge tables differ")
      val got = gotState.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      assert(got === wantState, s"trial $trial segmentations differ")
    }
  }

  test("winnowing guarantee holds on random corpora with planted shared runs") {
    // the MOSS theorem: any two docs sharing a run of >= w+k-1 tokens
    // share a fingerprint HASH — checked over random vocab draws with
    // a shared span planted at random offsets (k=3, w=4, run = 7)
    val rnd = new Random(41)
    val vocab = (0 until 300).map(i => s"v${i}q")
    val rows = (0 until 40).flatMap { pair =>
      val run = Seq.fill(7)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      Seq(0, 1).map { side =>
        val pre = Seq.fill(5 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
        val post = Seq.fill(5 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
        ((pair * 2 + side).toLong, (pre :+ run :++ post).mkString(" "))
      }
    }
    val fp = graft.text.TextAnalysis
      .winnowFingerprints(rows.toDF("doc_id", "text"), k = 3, w = 4)
      .select("doc_id", "fp_hash").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (0 until 40).foreach { pair =>
      val (a, b) = (pair * 2L, pair * 2L + 1)
      assert(fp(a).intersect(fp(b)).nonEmpty,
        s"pair $pair shares a 7-token run but no fingerprint")
    }
  }

  test("novelty conservation: sum of novel shingles == corpus distinct shingles") {
    // every distinct shingle hash is novel for exactly ONE document
    // (its first seer) — the invariant that makes novelty a partition
    // of the corpus vocabulary, batch or incremental
    val rnd = new Random(43)
    val vocab = (0 until 50).map(i => s"w${i}x")
    val rows = (0 until 60).map { i =>
      (i.toLong,
        Seq.fill(4 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }
    val docs = rows.toDF("doc_id", "text")
    val nv = graft.text.TextAnalysis.noveltyScores(docs).collect()
    val sumNovel = nv.map(_.getLong(2)).sum
    val distinctShingles = graft.text.TextAnalysis
      .firstSeenShingles(docs).count()
    assert(sumNovel === distinctShingles)
    // and the incremental split reproduces the batch rows exactly
    val inc = graft.text.TextAnalysis.noveltyIncremental(
        docs.where(col("doc_id") >= 30),
        graft.text.TextAnalysis.firstSeenShingles(
          docs.where(col("doc_id") < 30)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val full = nv.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap.filter(_._1 >= 30)
    assert(inc === full)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sampling.Sampling

class SamplingSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(n: Int) =
    (1L to n.toLong).map(i => (i, s"src${i % 7}", 100 + (i * 37 % 400)))
      .toDF("doc_id", "source", "n_chars")

  test("sampleByHash is deterministic, salt-independent, near the fraction") {
    val d = docs(2000)
    val s1 = Sampling.sampleByHash(d, "doc_id", 0.3, salt = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1again = Sampling.sampleByHash(d.repartition(7), "doc_id", 0.3, salt = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s1again, "same (key, salt, fraction) must select the same rows")
    val s2 = Sampling.sampleByHash(d, "doc_id", 0.3, salt = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 !== s2, "different salts draw different samples")
    // a universal hash keeps the realized rate near the target
    assert(math.abs(s1.size / 2000.0 - 0.3) < 0.05, s"rate ${s1.size / 2000.0}")
    // nested sampling: fraction 0.1 with the same salt is a subset of 0.3
    val s01 = Sampling.sampleByHash(d, "doc_id", 0.1, salt = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s01.subsetOf(s1), "smaller fraction must nest inside larger (same salt)")
  }

  test("packSequences fills fixed token budgets contiguously per shard") {
    val d = (1L to 500L).map(i => (i, 1L + (i * 13 % 50))).toDF("doc_id", "n_tokens")
    val out = Sampling.packSequences(d, "doc_id", "n_tokens",
        budget = 128L, shards = 4, salt = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length === 500, "packing keeps every document")
    // offsets are inside the budget window; seq_id is the budget
    // quotient of the running start
    out.foreach { case (_, _, _, _, off) => assert(off >= 0 && off < 128) }
    // replay each shard in key order: every doc starts at the running
    // token offset of its predecessors
    out.groupBy(_._3).values.foreach { shardRows =>
      var run = 0L
      shardRows.sortBy(_._1).foreach { case (_, toks, _, seqId, off) =>
        assert(seqId === run / 128, "seq_id must be the budget quotient of the start")
        assert(off === run % 128, "seq_offset must be the budget remainder of the start")
        run += toks
      }
    }
    // deterministic under repartitioning
    val again = Sampling.packSequences(d.repartition(7), "doc_id", "n_tokens",
        budget = 128L, shards = 4, salt = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(again.toSeq === out.sortBy(_._1).toSeq)
  }

  test("assignSplits is disjoint-exhaustive, deterministic, near the fractions") {
    val d = docs(2000)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.assignSplits(d, "doc_id", splits, salt = 1)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out.length === 2000, "every row gets exactly one split")
    assert(out.forall(_._2 != null))
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(sizes("train") / 2000.0 - 0.8) < 0.05, s"$sizes")
    assert(math.abs(sizes("val") / 2000.0 - 0.1) < 0.03, s"$sizes")
    // deterministic under repartitioning
    val again = Sampling.assignSplits(d.repartition(7), "doc_id", splits, salt = 1)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.toMap === again)
    // quantization guard: fractions that don't cover [0,1) are rejected
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(d, "doc_id", Seq("a" -> 0.5, "b" -> 0.4), salt = 1)
    }
  }

  test("splitByGroup keeps every group member in one split; singletons degrade") {
    import spark.implicits._
    val d = docs(300)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // groups of 3 consecutive ids for the first half; second half absent
    // from the group table (singleton degradation path)
    val groups = (0L until 150L).map(i => (i, i - i % 3)).toDF("doc_id", "group_id")
    val out = Sampling.splitByGroup(d, "doc_id", groups, "doc_id", "group_id",
      splits, salt = 1)
    val rows = out.select("doc_id", "group_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === 300, "left join keeps every row")
    // leakage safety: one split per group
    rows.groupBy(_._2).foreach { case (g, members) =>
      assert(members.map(_._3).toSet.size === 1, s"group $g straddles splits")
    }
    // absent keys form their own singleton group...
    rows.filter(_._1 >= 150L).foreach { case (id, g, _) => assert(g === id) }
    // ...and then match assignSplits on the raw key exactly
    val plain = Sampling.assignSplits(d.where(col("doc_id") >= 150), "doc_id",
      splits, salt = 1).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(_._1 >= 150L).foreach { case (id, _, s) => assert(plain(id) === s) }
  }

  test("samplePerGroup keeps n hash-ordered rows per group, layout-independent") {
    val d = docs(300)
    val out = Sampling.samplePerGroup(d, "doc_id", Seq("source"), n = 4, salt = 2)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.groupBy(_._2).values.forall(_.length <= 4))
    val again = Sampling.samplePerGroup(d.repartition(5), "doc_id", Seq("source"),
        n = 4, salt = 2)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // a different salt draws a different per-group subset
    val other = Sampling.samplePerGroup(d, "doc_id", Seq("source"), n = 4, salt = 9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other !== out.map(_._1).toSet)
  }

  test("sampleTemperature flattens the mix: tail kept whole, head downweighted") {
    import spark.implicits._
    // 900 rows of domain A vs 100 of B: raw mix 90/10; √n flattening
    // targets 75/25 shares, so at outFraction 0.5 B's flattened share
    // (125) exceeds its size → keep-everything, while A keeps ~42%
    val df = ((1L to 900L).map(i => (i, "A")) ++ (1001L to 1100L).map(i => (i, "B")))
      .toDF("doc_id", "source")
    val out = Sampling.sampleTemperature(df, "doc_id", "source",
      outFraction = 0.5, salt = 1)
    val byGroup = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup("B") === 100L, "small group must cap at keep-everything")
    val aFrac = byGroup("A").toDouble / 900.0
    assert(aFrac > 0.3 && aFrac < 0.55, s"head group kept $aFrac, expected ~0.42")
    // deterministic: the same call selects the same rows
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.sampleTemperature(df, "doc_id", "source",
      outFraction = 0.5, salt = 1)
    assert(ids(again) === ids(out))
  }

  test("capPerGroup keeps the top-n per group in quality order") {
    val d = docs(100)
    val out = Sampling.capPerGroup(d, Seq("source"), "n_chars", "doc_id", n = 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    val byGroup = out.groupBy(_._1)
    assert(byGroup.values.forall(_.length <= 3))
    byGroup.values.foreach { rows =>
      // ranks are 1..k and n_chars non-increasing along them
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to rows.length))
      assert(sorted.map(_._3).toSeq.reverse.sorted.reverse === sorted.map(_._3).toSeq)
      // nothing outside the cap beats anything inside it
      val kept = rows.map(_._2).toSet
      val groupAll = (1L to 100L).filter(i => s"src${i % 7}" == rows.head._1)
      val worstKept = rows.map(_._3).min
      groupAll.filterNot(kept).foreach { i =>
        val nc = 100L + (i * 37 % 400)
        assert(nc <= worstKept || rows.length < 3)
      }
    }
  }

  test("shuffleToShards: reproducible placement, complete, contiguous pos") {
    val d = docs(500)
    def run(input: org.apache.spark.sql.DataFrame, salt: Int) =
      Sampling.shuffleToShards(input, "doc_id", nShards = 8, salt = salt)
        .select("doc_id", "shard", "pos").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val p1 = run(d, salt = 1)
    // same (key, salt, nShards) → identical placement on any partitioning
    assert(run(d.repartition(7), salt = 1) === p1)
    // complete: every key placed exactly once
    assert(p1.keySet === (1L to 500L).toSet)
    // per shard, pos is exactly 0..count-1 (a permutation, no gaps)
    p1.values.groupBy(_._1).foreach { case (shard, rows) =>
      val ps = rows.map(_._2).toSeq.sorted
      assert(ps === (0L until ps.length.toLong), s"shard $shard pos not contiguous")
    }
    // a different salt draws a different permutation
    assert(run(d, salt = 2) !== p1)
  }

  test("incremental shards: history never moves, batch appends per shard") {
    val d = docs(400)
    val history = d.where(col("doc_id") <= 300)
    val batch = d.where(col("doc_id") > 300)
    val placedHist = Sampling.shuffleToShards(history, "doc_id", nShards = 4, salt = 3)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val counts = Sampling.shuffleToShards(history, "doc_id", nShards = 4, salt = 3)
      .groupBy("shard").agg(count(lit(1)).as("n_rows"))
    val placedInc = Sampling.shuffleToShardsIncremental(batch, counts,
        "doc_id", nShards = 4, salt = 3)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same hash → a key's shard matches what a full run would assign
    val fullShards = Sampling.shuffleToShards(d, "doc_id", nShards = 4, salt = 3)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    placedInc.foreach { case (id, shard, _) =>
      assert(shard === fullShards(id), s"doc $id changed shard")
    }
    // batch pos continues at each shard's high-water mark, no collisions
    val histByShard = placedHist.groupBy(_._2)
    placedInc.groupBy(_._2).foreach { case (shard, rows) =>
      val histN = histByShard.get(shard).map(_.length).getOrElse(0)
      val ps = rows.map(_._3).sorted
      assert(ps.head === histN.toLong, s"shard $shard must append at $histN")
      assert(ps.toSeq === (histN.toLong until (histN + ps.length).toLong),
        s"shard $shard increment pos not contiguous")
    }
  }

  test("importanceWeights separates target-like from raw-only vocabulary") {
    // disjoint vocabularies: target docs speak A-words, the rest B-words
    val d = ((1L to 40L).map(i => (i, "alpha beta gamma delta", "en")) ++
        (41L to 80L).map(i => (i, "omega psi chi phi", "xx")))
      .toDF("doc_id", "text", "lang")
    val w = Sampling.importanceWeights(d, col("lang") === "en", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(w.length === 80)
    val (target, raw) = w.partition(_._1 <= 40L)
    // every target doc outscores every raw doc (disjoint vocab)
    assert(target.map(_._3).min > raw.map(_._3).max,
      "target-vocabulary docs must carry higher importance")
    // weights are per-content: identical texts score identically
    assert(target.map(_._3).distinct.length === 1)
    assert(w.forall(_._2 === 4L), "n_tokens must count whitespace tokens")
  }

  test("importanceWeights is partitioning-independent and selection is top-k") {
    val d = (1L to 60L)
      .map(i => (i, if (i % 3 == 0) "apple pie" else "rock dust stone", 
        if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val a = Sampling.importanceWeights(d, col("lang") === "en", buckets = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sampling.importanceWeights(d.repartition(7), col("lang") === "en",
        buckets = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b, "weights must not depend on the input partitioning")
    val sel = Sampling.selectByImportance(d, col("lang") === "en", k = 10,
      buckets = 32).collect()
    assert(sel.length === 10)
    val scores = sel.map(_.getAs[Long]("score_per_token"))
    assert(scores.toSeq === scores.sortBy(-_).toSeq, "selection is score-ordered")
    // the returned set IS the global top-10 under (score desc, doc_id)
    val all = Sampling.importanceWeights(d, col("lang") === "en", buckets = 32)
      .withColumn("spt", floor(col("importance_fp") / col("n_tokens")).cast("long"))
      .collect().map(r => (-r.getAs[Long]("spt"), r.getAs[Long]("doc_id")))
      .sorted.take(10).map(_._2).toSet
    assert(sel.map(_.getAs[Long]("doc_id")).toSet === all)
  }

  test("mixturePlan: rates hit targets, short groups taken whole, untargeted zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // en mass 200, de mass 40, xx untargeted
    val d = Seq(
      ("en", 100L), ("en", 100L), ("de", 40L), ("xx", 30L))
      .toDF("lang", "n_tok")
    val plan = graft.sampling.Sampling
      .mixturePlan(d, "lang", col("n_tok"),
        Seq("en" -> 500L, "de" -> 500L), budgetTokens = 200L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // en: target 100 of mass 200 -> rate 0.5, expect 100
    assert(plan("en") === ((200L, 100L, 500000L, 100L)))
    // de: target 100 > mass 40 -> rate clamps to 1.0, expect all 40
    assert(plan("de") === ((40L, 100L, 1000000L, 40L)))
    // xx: no target -> rate 0
    assert(plan("xx") === ((30L, 0L, 0L, 0L)))
  }

  test("bootstrapMeanCi: constant column collapses to a point interval") {
    import spark.implicits._
    val df = (1L to 200L).map(k => (k, 700L)).toDF("k", "v")
    val out = Sampling.bootstrapMeanCi(df, "k", "v")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // every resample mean of a constant is the constant
    assert(out === ((200L, 70000L, 70000L, 70000L, 40L)))
  }

  test("bootstrapMeanCi: interval brackets the mean and orders correctly") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1L to 500L).map(k => (k, 100L + rnd.nextInt(900))).toDF("k", "v")
    val out = Sampling.bootstrapMeanCi(df, "k", "v")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out._3 <= out._2 && out._2 <= out._4,
      s"CI [${out._3}, ${out._4}] must bracket mean ${out._2}")
    assert(out._4 - out._3 > 0, "nonzero spread on random data")
    assert(out._5 === 40L)
    // determinism: same inputs, same interval
    val again = Sampling.bootstrapMeanCi(df.repartition(7), "k", "v")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(again === out, "partitioning must not change the resamples")
  }

  test("neymanAllocation: noisy strata draw budget, constant strata none") {
    import spark.implicits._
    // stratum a: constant (variance 0); stratum b: spread
    val df = (Seq.fill(100)(("a", 50L)) ++
      (1L to 100L).map(i => ("b", i * 10)))
      .toDF("g", "v")
    val got = Sampling.neymanAllocation(df, "g", "v", budget = 60L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") === ((100L, 0L, 0L)), "zero variance → zero weight")
    // b takes the whole budget, clamped at its size (60 < 100)
    assert(got("b")._1 === 100L)
    assert(got("b")._3 === 60L)
    // weight replay: w = floor(sqrt(N·Σx² − (Σx)²))
    val xs = (1L to 100L).map(_ * 10)
    val w = math.floor(math.sqrt(
      (100.0 * xs.map(x => x * x).sum - math.pow(xs.sum.toDouble, 2)))).toLong
    assert(got("b")._2 === w)
  }

  test("neymanAllocation: equal-variance strata split by size; clamp bites") {
    import spark.implicits._
    // same value multiset, stratum c has 3x the rows of d
    val base = Seq(1L, 5L, 9L)
    val df = ((1 to 3).flatMap(r => base.map(v => ("c", v + 0L))) ++
      base.map(v => ("d", v)))
      .toDF("g", "v")
    val got = Sampling.neymanAllocation(df, "g", "v", budget = 8L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // w ∝ sqrt(N²·Var) = N·S: c's weight ≈ 3× d's (same per-row S)
    assert(got("c")._2 > 2 * got("d")._2 && got("c")._2 < 4 * got("d")._2)
    // d's fair share is 2 = min(budget·w_d/Σw, 3)
    assert(got("d")._3 <= 3L)
    assert(got("c")._3 + got("d")._3 <= 8L, "floors never over-allocate")
  }
}

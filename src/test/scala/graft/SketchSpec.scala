package graft

import org.apache.spark.sql.functions._

import graft.sketch.Sketches

class SketchSpec extends SparkTestBase {

  test("approx distinct counts stay within the rsd bound of exact") {
    import spark.implicits._
    // 60k rows, two columns of known distinct cardinality
    val df = (0 until 60000).map(i => (i.toLong % 10000, (i * 31 % 997).toLong))
      .toDF("hi_card", "lo_card")
    val out = Sketches.approxDistinct(df, Seq("hi_card", "lo_card"), rsd = 0.02).head()
    val (hi, lo) = (out.getLong(0), out.getLong(1))
    // 5 sigma of the configured 2% rsd — a deterministic sketch of a
    // fixed dataset either passes forever or the bound claim is wrong
    assert(math.abs(hi - 10000L) <= 10000L * 0.10, s"hi_card approx $hi vs 10000")
    assert(math.abs(lo - 997L) <= 997L * 0.10, s"lo_card approx $lo vs 997")
  }

  test("approx quantiles land within rank-accuracy of the exact percentile") {
    import spark.implicits._
    val df = (1 to 20000).map(i => ("g", i.toLong)).toDF("grp", "v")
    val out = Sketches.approxQuantiles(df, "grp", "v",
      percentiles = Seq(0.5, 0.9, 0.99), accuracy = 10000).head()
    val qs = out.getSeq[Long](1)
    // value space == rank space here (v = 1..n), so rank error 1e-4
    // translates to ±2 values at n=20000; allow 10x slack
    assert(math.abs(qs(0) - 10000L) <= 20, s"p50 ${qs(0)}")
    assert(math.abs(qs(1) - 18000L) <= 20, s"p90 ${qs(1)}")
    assert(math.abs(qs(2) - 19800L) <= 20, s"p99 ${qs(2)}")
    assert(out.getLong(2) === 20000L)
  }

  test("heavy hitters: no false negatives, bracketed estimates, heaviest first") {
    import spark.implicits._
    // Zipf-ish stream: "tok0" x 4000, "tok1" x 2000, ..., plus a long
    // unique tail — heavy items far above the n/maxMapSize threshold
    val heavy = (0 until 5).flatMap(i => Seq.fill(4000 >> i)(s"tok$i"))
    val tail = (0 until 3000).map(i => s"rare$i")
    val df = scala.util.Random.shuffle(heavy ++ tail).toDF("tok")
      .repartition(7) // fixed layout → deterministic sketch
    val n = heavy.size + tail.size
    val out = Sketches.topItems(df, "tok", maxMapSize = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val trueCounts = heavy.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // every item with true count > n/maxMapSize must be reported
    val threshold = n / 64
    for ((tok, c) <- trueCounts if c > threshold)
      assert(out.exists(_._1 == tok), s"$tok (count $c > $threshold) missing")
    // reported brackets contain the true counts
    for ((tok, est, lb, ub) <- out if trueCounts.contains(tok)) {
      val c = trueCounts(tok)
      assert(lb <= c && c <= ub, s"$tok: true $c outside [$lb, $ub]")
      assert(lb <= est && est <= ub)
    }
    // heaviest first
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
    assert(out.head._1 === "tok0")
  }

  test("sketch aggregation is a single two-phase aggregate (no distinct expand)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("a", "b")
    val plan = Sketches.approxDistinct(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    // exact COUNT(DISTINCT a), COUNT(DISTINCT b) in one query plans an
    // Expand (one shuffle stream per distinct column); HLL sketches
    // partial-aggregate both columns through ONE exchange
    assert(!plan.contains("Expand"), s"sketch plan grew an Expand:\n$plan")
  }

  test("union of per-batch sketches == single-pass sketch, exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 3 overlapping batches of values; HLL union is a per-register max
    // so the merged estimate must EQUAL the single-pass estimate — not
    // just approximate it
    val rows = (0 until 3).flatMap(b =>
      (b * 300 until b * 300 + 600).map(v => (s"batch$b", s"v$v")))
    val df = rows.toDF("batch", "v")
    val perBatch = Sketches.distinctSketches(df, "batch", "v")
    val merged = Sketches.unionDistinctEstimate(
      perBatch.withColumn("all", lit("all"))
        .select(col("all"), col("sketch"), col("n_rows")), "all")
      .collect().head
    val single = Sketches.unionDistinctEstimate(
      Sketches.distinctSketches(df.withColumn("all", lit("all")), "all", "v")
        .select(col("all"), col("sketch"), col("n_rows")), "all")
      .collect().head
    assert(merged.getLong(1) === single.getLong(1),
      "merged and single-pass estimates must be identical")
    assert(merged.getLong(2) === 1800L, "row counts sum across batches")
    // and the estimate honors the documented error bound vs exact
    val exact = df.select("v").distinct().count()
    assert(math.abs(merged.getLong(1) - exact).toDouble / exact < 0.05,
      s"estimate ${merged.getLong(1)} too far from exact $exact")
  }

  test("KLL: merged per-batch quantile sketches honor the rank-error bound") {
    import spark.implicits._
    // value space == rank space (v = 1..n): the realized rank of a
    // reported quantile is the value itself
    val n = 40000
    val df = (1 to n).map(i => ((i % 8).toString, i.toLong)).toDF("batch", "v")
    val sketches = Sketches.quantileSketches(df
        .withColumn("g", lit("all")), "g", "v")
    // trivially one group; now the batched path: one sketch per batch,
    // union per constant group
    val perBatch = Sketches.quantileSketches(df, "batch", "v")
      .withColumn("g", lit("all"))
      .select(col("g"), col("sketch"), col("n_rows"))
    val merged = Sketches.unionQuantileEstimate(perBatch, "g",
      ranks = Seq(0.25, 0.5, 0.9)).head()
    val qs = merged.getSeq[Double](1)
    assert(merged.getLong(2) === n.toLong)
    // k=200 -> ~1.65% single-sided rank error; allow 3%
    val eps = 0.03 * n
    assert(math.abs(qs(0) - 0.25 * n) <= eps, s"p25 ${qs(0)}")
    assert(math.abs(qs(1) - 0.50 * n) <= eps, s"p50 ${qs(1)}")
    assert(math.abs(qs(2) - 0.90 * n) <= eps, s"p90 ${qs(2)}")
    // the single-pass sketch obeys the same bound (merge loses only
    // the published accuracy, not correctness)
    val single = Sketches.unionQuantileEstimate(
      sketches.select(col("g"), col("sketch"), col("n_rows")), "g",
      ranks = Seq(0.5)).head().getSeq[Double](1)
    assert(math.abs(single(0) - 0.5 * n) <= eps, s"single-pass p50 ${single(0)}")
  }

  test("KLL sketches survive shuffle-boundary serialization") {
    import spark.implicits._
    // many partitions force partial->final merges through
    // serialize/deserialize; nulls must be ignored, not crash
    val df = (1 to 5000).map(i => ("g", if (i % 100 == 0) None else Some(i.toLong)))
      .toDF("g", "v").repartition(13)
    val out = Sketches.quantileSketches(df, "g", "v")
    val merged = Sketches.unionQuantileEstimate(out, "g", ranks = Seq(0.5)).head()
    assert(merged.getLong(2) === 4950L, "nulls excluded from n_rows")
    assert(math.abs(merged.getSeq[Double](1)(0) - 2500.0) <= 200.0)
  }

  test("bloom: zero false negatives, bounded false-positive rate") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // NEGATIVE keys exercise the pmod folding (shingle hashes are signed)
    val members = Seq.fill(900)(rnd.nextLong()).distinct
    val df = members.map(("g", _)).toDF("g", "key")
    val bloom = Sketches.bloomBits(df, "g", "key", nWords = 256, k = 4)
    val nonMembers = Seq.fill(3000)(rnd.nextLong()).distinct
      .filterNot(members.toSet)
    val probes = (members ++ nonMembers).map(("g", _)).toDF("g", "key")
    val got = Sketches.bloomProbe(bloom, probes, "g", "key", nWords = 256, k = 4)
      .as[(String, Long, Boolean)].collect().map(r => r._2 -> r._3).toMap
    // membership guarantee: EVERY inserted key probes true
    assert(members.forall(got(_)), "bloom false negative")
    // FPR at n=900, m=16128, k=4: (1-e^(-kn/m))^4 ≈ 1.6%; allow 3x slack
    val fp = nonMembers.count(got(_))
    assert(fp.toDouble / nonMembers.size < 0.05,
      s"$fp false positives in ${nonMembers.size}")
  }

  test("bloom: per-batch bit_or union == single-pass bloom, exactly") {
    import spark.implicits._
    val keys = (0L until 600L).map(i => (s"b${i % 3}", i * 7919L))
    val whole = keys.map { case (_, k) => ("g", k) }.toDF("g", "key")
    val single = Sketches.bloomBits(whole, "g", "key")
      .select("word_idx", "bits").as[(Long, Long)].collect().toMap
    // three batch blooms, merged by bit_or on word_idx — the persisted
    // incremental form
    val batches = keys.map { case (b, k) => (b, k) }.toDF("b", "key")
    val merged = Sketches.bloomBits(batches.withColumn("g", col("b")), "g", "key")
      .groupBy("word_idx").agg(bit_or(col("bits")).as("bits"))
      .as[(Long, Long)].collect().toMap
    assert(merged === single)
  }

  test("count-min join-size estimate: never under; exact when collision-free; 0 on disjoint") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val a = Seq.fill(4000)(("g", rnd.nextInt(200).toLong)).toDF("g", "key")
    val b = Seq.fill(300)(("g", rnd.nextInt(400).toLong)).toDF("g", "key")
    val exact = a.join(b.select(col("key").as("k2")), col("key") === col("k2"))
      .count()
    val est = Sketches.cmsJoinSizeEstimate(
      Sketches.cmsCounts(a, "g", "key", width = 128),
      Sketches.cmsCounts(b, "g", "key", width = 128), "g")
      .select("join_size_est").as[Long].head()
    assert(est >= exact, s"inner product underestimated: $est < $exact")
    // width 8192: residual cross-key slot coincidences inflate each
    // row by ≈ |a|·|b|/width in expectation — the published AMS-style
    // additive bound; assert twice it (exact equality is NOT the
    // contract, even far below capacity — birthday collisions remain)
    val estWide = Sketches.cmsJoinSizeEstimate(
      Sketches.cmsCounts(a, "g", "key", width = 8192),
      Sketches.cmsCounts(b, "g", "key", width = 8192), "g")
      .select("join_size_est").as[Long].head()
    assert(estWide >= exact)
    assert(estWide - exact <= 2L * 4000L * 300L / 8192L,
      s"overestimate ${estWide - exact} past the additive bound")
    // disjoint key ranges in a wide table: no common slot → short rows → 0
    val d1 = Seq(("g", 1L)).toDF("g", "key")
    val d2 = Seq(("g", 2L)).toDF("g", "key")
    val z = Sketches.cmsJoinSizeEstimate(
      Sketches.cmsCounts(d1, "g", "key", width = 8192),
      Sketches.cmsCounts(d2, "g", "key", width = 8192), "g")
      .select("join_size_est").as[Long].head()
    assert(z === 0L)
  }

  test("streaming faces: foreachBatch-merged bloom and CMS == single pass, exactly") {
    // the persisted-sketch family's streaming story: every member's
    // merge (bit_or / cnt-sum) is associative, so per-micro-batch
    // sketches folded in foreachBatch equal the batch build bit-for-bit
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val keys = (0L until 3000L).map(i => ("g", i % 700L))
    val input = MemoryStream[(String, Long)]
    @volatile var bloom: Option[org.apache.spark.sql.DataFrame] = None
    @volatile var cms: Option[org.apache.spark.sql.DataFrame] = None
    val q = input.toDS().toDF("g", "key")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = Sketches.bloomBits(batch, "g", "key").localCheckpoint()
        val c = Sketches.cmsCounts(batch, "g", "key").localCheckpoint()
        bloom = Some(bloom.fold(b)(prev => prev.unionByName(b)
          .groupBy("g", "word_idx").agg(bit_or(col("bits")).as("bits"))
          .localCheckpoint()))
        cms = Some(cms.fold(c)(prev => prev.unionByName(c)
          .groupBy("g", "r", "slot").agg(sum(col("cnt")).as("cnt"))
          .localCheckpoint()))
      }
      .start()
    try {
      for (b <- keys.grouped(800)) { input.addData(b: _*); q.processAllAvailable() }
      val bloomStream = bloom.get.select("word_idx", "bits")
        .as[(Long, Long)].collect().toSet
      val bloomBatch = Sketches.bloomBits(keys.toDF("g", "key"), "g", "key")
        .select("word_idx", "bits").as[(Long, Long)].collect().toSet
      assert(bloomStream === bloomBatch)
      val cmsStream = cms.get.select("r", "slot", "cnt")
        .as[(Long, Long, Long)].collect().toSet
      val cmsBatch = Sketches.cmsCounts(keys.toDF("g", "key"), "g", "key")
        .select("r", "slot", "cnt").as[(Long, Long, Long)].collect().toSet
      assert(cmsStream === cmsBatch)
    } finally q.stop()
  }

  test("streaming KLL: stream-persisted sketches union to exact n/min/max, bounded interior") {
    // Why this is NOT the bit-equality the bloom/CMS case above pins:
    // KLL compaction draws its offset coin from an unseeded shared
    // Random, so two sketches built from IDENTICAL input in the same
    // JVM already differ byte-for-byte — witnessed here, so the dead
    // end is checked-in evidence rather than a comment:
    import org.apache.datasketches.kll.KllDoublesSketch
    val w1 = KllDoublesSketch.newHeapInstance(200)
    val w2 = KllDoublesSketch.newHeapInstance(200)
    for (i <- 0 until 50000) { w1.update((i % 9173).toDouble); w2.update((i % 9173).toDouble) }
    assert(!java.util.Arrays.equals(w1.toByteArray(), w2.toByteArray()),
      "KLL became input-deterministic — upgrade this spec to full bit-equality")
    // What IS deterministic across any build/merge schedule: n (exact
    // count), min (rank 0) and max (rank 1) — KLL retains them exactly
    // through every compaction. The streaming face must agree with the
    // batch build EXACTLY on those, and within the published rank
    // error on interior ranks.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val n = 30000
    val rows = (1 to n).map(i => ("all", i.toLong))
    val input = MemoryStream[(String, Long)]
    @volatile var persisted: Option[org.apache.spark.sql.DataFrame] = None
    val q = input.toDS().toDF("g", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the real streaming pattern for persisted sketches: APPEND one
        // sketch row per micro-batch; union happens at read time
        val sk = Sketches.quantileSketches(batch, "g", "v").localCheckpoint()
        persisted = Some(persisted.fold(sk)(_.unionByName(sk).localCheckpoint()))
      }
      .start()
    try {
      for (b <- rows.grouped(7000)) { input.addData(b: _*); q.processAllAvailable() }
      val ranks = Seq(0.0, 0.5, 1.0)
      val stream = Sketches.unionQuantileEstimate(persisted.get, "g", ranks).head()
      val batch = Sketches.unionQuantileEstimate(
        Sketches.quantileSketches(rows.toDF("g", "v"), "g", "v"), "g", ranks).head()
      assert(stream.getLong(2) === n.toLong)
      assert(batch.getLong(2) === n.toLong)
      val (sq, bq) = (stream.getSeq[Double](1), batch.getSeq[Double](1))
      assert(sq(0) === 1.0 && bq(0) === 1.0, "rank-0 min is exact")
      assert(sq(2) === n.toDouble && bq(2) === n.toDouble, "rank-1 max is exact")
      val eps = 0.03 * n
      assert(math.abs(sq(1) - 0.5 * n) <= eps, s"stream p50 ${sq(1)}")
      assert(math.abs(bq(1) - 0.5 * n) <= eps, s"batch p50 ${bq(1)}")
    } finally q.stop()
  }

  test("count-min: never underestimates; batch-sum union == single pass") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val keys = Seq.fill(5000)(rnd.nextInt(300).toLong - 150L) // signed, skewed
    val df = keys.map(("g", _)).toDF("g", "key")
    val cms = Sketches.cmsCounts(df, "g", "key", depth = 4, width = 128)
    val probes = keys.distinct.map(("g", _)).toDF("g", "key")
    val est = Sketches.cmsEstimate(cms, probes, "g", "key", depth = 4, width = 128)
      .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((k, n) <- exact) assert(est(k) >= n, s"cms underestimated key $k")
    // width 128 << 300 distinct keys forces collisions; the estimate
    // must still be within the 2n/width Markov bound most of the time
    val over = exact.count { case (k, n) => est(k) > n + 2 * 5000 / 128 }
    assert(over < exact.size / 4, s"$over far overestimates")
    // mergeability: per-batch counts summed on (r, slot) == single pass
    val batched = keys.zipWithIndex.map { case (k, i) => (s"b${i % 4}", k) }
      .toDF("g", "key")
    val mergedCms = Sketches.cmsCounts(batched, "g", "key", depth = 4, width = 128)
      .groupBy("r", "slot").agg(sum(col("cnt")).as("cnt"))
      .as[(Long, Long, Long)].collect().toSet
    val singleCms = Sketches.cmsCounts(df, "g", "key", depth = 4, width = 128)
      .select("r", "slot", "cnt").as[(Long, Long, Long)].collect().toSet
    assert(mergedCms === singleCms)
  }
}

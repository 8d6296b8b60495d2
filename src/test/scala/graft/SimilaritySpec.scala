package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

class SimilaritySpec extends SparkTestBase {

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("bruteTopK ranks by exact cosine with vec_id tie-break") {
    val d = vecs(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0.01f),   // nearly parallel to 0
      2L -> Seq(0f, 1f),      // orthogonal to 0
      3L -> Seq(-1f, 0f))     // opposite to 0
    val out = Similarity.bruteTopK(d.where(col("vec_id") === 0), d, k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
  }

  test("cosine of identical vectors is ~1") {
    val d = vecs(0L -> Seq(0.5f, 0.25f, 1f), 1L -> Seq(0.5f, 0.25f, 1f))
    val c = Similarity.bruteTopK(d.where(col("vec_id") === 0), d, k = 1)
      .collect().head.getDouble(2)
    assert(math.abs(c - 1.0) < 1e-4)
  }

  test("LSH ANN achieves reasonable recall vs brute force on real data") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 8)
    val brute = Similarity.bruteTopK(q, emb, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(q, emb, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.2, s"LSH recall $recall too low (found ${ann.size} pairs)")
  }

  test("IVF ANN achieves reasonable recall vs brute force on real data") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 8)
    val brute = Similarity.bruteTopK(q, emb, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, emb, k = 5, nCells = 8, nProbe = 4)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall $recall too low (found ${ivf.size} pairs)")
  }

  test("IVF with nProbe == nCells equals brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(60).cache()
    val q = emb.where(col("vec_id") < 3)
    val brute = Similarity.bruteTopK(q, emb, k = 4)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(q, emb, k = 4, nCells = 4, nProbe = 4)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf === brute)
  }

  test("k-means refinement moves centroids to cluster means and keeps recall") {
    // two tight, well-separated direction clusters; seeds (ids 0,1) are
    // both in cluster A, so WITHOUT refinement every vector lands in the
    // seed cells by raw cosine, but WITH one Lloyd pass cell 1's
    // centroid migrates toward whichever cluster dominates its members
    val a = Seq(1f, 0.1f, 0f)
    val b = Seq(0f, 0.1f, 1f)
    def jitter(base: Seq[Float], i: Int) = base.map(_ + i * 0.001f)
    val d = vecs(
      (0L to 4L).map(i => i -> jitter(a, i.toInt)) ++
        (5L to 9L).map(i => i -> jitter(b, i.toInt)): _*)
    val q = d.where(col("vec_id") === 7)
    val refined = Similarity.ivfTopK(q, d, k = 3, nCells = 2, nProbe = 1,
      kmeansIters = 1)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    // after refinement, probing ONE cell from a b-cluster query must
    // return ONLY b-cluster neighbours (without refinement both seeds
    // sit in cluster A and the single probed cell mixes clusters)
    assert(refined.length === 3)
    assert(refined.map(_._1).toSet.subsetOf(Set(5L, 6L, 8L, 9L)),
      s"non-b-cluster neighbour in ${refined.toSeq}")
    // determinism: a second run is bit-identical
    val again = Similarity.ivfTopK(q, d, k = 3, nCells = 2, nProbe = 1,
      kmeansIters = 1)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(refined.toSeq === again.toSeq)
  }

  test("kmeansAssign separates direction clusters and sums into kmeansSummary") {
    // two tight direction clusters; after 2 Lloyd passes every vector
    // must share a cell with its own cluster only
    val a = Seq(1f, 0.1f, 0f)
    val b = Seq(0f, 0.1f, 1f)
    def jitter(base: Seq[Float], i: Int) = base.map(_ + i * 0.001f)
    val d = vecs(
      (0L to 4L).map(i => i -> jitter(a, i.toInt)) ++
        (5L to 9L).map(i => i -> jitter(b, i.toInt)): _*)
    val assign = Similarity.kmeansAssign(d, nCells = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(assign.length === 10)
    val byCell = assign.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCell.values.toSet === Set((0L to 4L).toSet, (5L to 9L).toSet),
      s"clusters not separated: $byCell")
    // confidence: every member within its tight cluster is near-parallel
    // to the centroid (ccos_s is 1e-6-scaled cosine)
    assert(assign.forall(_._3 > 990000L), s"low ccos in ${assign.toSeq}")
    // summary is the exact per-cell fold of the assignment table
    val summary = Similarity.kmeansSummary(d, nCells = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = assign.groupBy(_._2).map { case (c, rows) =>
      (c, rows.length.toLong, rows.map(_._3).sum)
    }.toSet
    assert(summary === expected)
  }

  test("kmeansAssign is deterministic under input re-partitioning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val once = Similarity.kmeansAssign(emb, nCells = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val again = Similarity.kmeansAssign(emb.repartition(7), nCells = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(once === again)
  }

  test("native FixedPointDot == HOF formulation, incl. mixed float/double") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq(0.5f, -0.25f, 1.75f), Seq(2.0f, 4.0f, -0.5f)),
      (2L, Seq(0f, 0f, 0f), Seq(1f, 1f, 1f)),
      (3L, Seq(1e-7f, -1e-7f, 3.3f), Seq(1e-7f, 2.2f, -3.3f)))
      .toDF("id", "a", "b")
    val rows = d.select(
        Similarity.dotFp(col("a"), col("b")).as("native"),
        Similarity.dotFpHof(col("a"), col("b")).as("hof"),
        // mixed element types: one side widened to double
        Similarity.dotFp(transform(col("a"), x => x.cast("double")), col("b")).as("mixed"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(1))
    }
    // length mismatch → null, matching zip_with's null padding semantics
    val nulls = d.select(Similarity.dotFp(col("a"), slice(col("b"), 1, 2)).as("n"),
        Similarity.dotFpHof(col("a"), slice(col("b"), 1, 2)).as("h"))
      .collect()
    nulls.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("native LshBucket == HOF formulation on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for (planes <- Seq(1, 4, 7)) {
      val mismatches = emb.select(
          Similarity.lshBucket(col("embedding"), planes).as("n"),
          Similarity.lshBucketHof(col("embedding"), planes).as("h"))
        .where(col("n") =!= col("h")).count()
      assert(mismatches === 0L, s"nPlanes=$planes")
    }
  }

  test("centroidStats sums fixed-point components per (group, dim) exactly") {
    import spark.implicits._
    val d = Seq(
      (0L, Seq(1.0f, -0.5f), "a"),
      (1L, Seq(0.25f, 0.5f), "a"),
      (2L, Seq(2.0f, 0.0f), "b"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidStats(d, "label").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // fixed-point: floor(x*1e6) per component, then integer sums
    assert(out(("a", 0L)) === ((2L, 1000000L + 250000L)))
    assert(out(("a", 1L)) === ((2L, -500000L + 500000L)))
    assert(out(("b", 0L)) === ((1L, 2000000L)))
    assert(out(("b", 1L)) === ((1L, 0L)))
    // layout-independent: same sums on any partitioning (integer adds)
    val again = Similarity.centroidStats(d.repartition(7), "label").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(again === out)
  }

  test("truncateNormalize keeps the prefix, unit norm, zero passthrough") {
    val d = vecs(
      0L -> Seq(3f, 4f, 100f, 100f), // prefix (3,4): norm 5
      1L -> Seq(0f, 0f, 9f, 9f))     // zero prefix: passthrough
    val out = Similarity.truncateNormalize(d, dims = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(0L).length === 2)
    assert(math.abs(out(0L)(0) - 0.6f) < 1e-5 && math.abs(out(0L)(1) - 0.8f) < 1e-5)
    assert(out(1L) === Seq(0f, 0f))
    // unit norm within fixed-point tolerance
    val n = out(0L).map(x => x.toDouble * x).sum
    assert(math.abs(n - 1.0) < 1e-4)
  }

  test("nearDupPairs finds duplicates within a block, none across") {
    import spark.implicits._
    val d = Seq(
      (0L, Seq(1f, 2f, 3f), 0),
      (1L, Seq(1f, 2f, 3f), 0),   // dup of 0, same block
      (2L, Seq(1f, 2f, 3f), 1),   // dup but different block → unseen
      (3L, Seq(-3f, 1f, -2f), 0)) // non-dup, same block
      .toDF("vec_id", "embedding", "label")
    val pairs = Similarity.nearDupPairs(d, "label", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("centroidOutliers flags the vector opposing its group centroid") {
    import spark.implicits._
    val d = Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(-1f, 0f), 0),   // opposes the group direction
      (3L, Seq(0f, 1f), 1))    // alone in its group → centroid is itself
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidOutliers(d, "label", minCosine = 0.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(0L -> false, 1L -> false, 2L -> true, 3L -> false))
  }

  test("centroidOutliers flags zero vectors (undefined cosine → sentinel)") {
    import spark.implicits._
    // a corrupt all-zero embedding has no defined cosine to any
    // centroid; NaN < minCosine would be FALSE, silently passing the
    // exact row outlier detection exists to catch — the −2 sentinel
    // flags it instead
    val d = Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0f, 0f), 0))   // corrupt: all-zero
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.centroidOutliers(d, "label", minCosine = 0.0)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(rows(2L) === ((-2.0, true)), "zero vector must be flagged")
    assert(!rows(0L)._2 && !rows(1L)._2)
    assert(!rows.values.exists(_._1.isNaN), "no NaN may escape the operator")
  }

  test("semanticDedup keeps the lowest-id representative per neighborhood") {
    // cells seed from ids 0 and 1; v2 is a near-dup of v0 (same cell),
    // v3 is orthogonal to everything (cell tie → lowest cell id) and kept
    val d = vecs(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0.99f, 0.01f, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0f))
    val out = Similarity.semanticDedup(d, nCells = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(0L) === (0L, true))
    assert(out(1L) === (1L, true))
    assert(out(2L)._1 === 0L)       // assigned to v0's cell
    assert(out(2L)._2 === false)    // dropped: near-dup of lower-id 0
    assert(out(3L) === (0L, true))  // orthogonal tie → cell 0, kept
  }

  test("semanticDedup drop rule is any-lower-id-neighbor (greedy, not transitive)") {
    // chain a–b–c where a~b and b~c but a!~c: b drops (neighbor a is
    // lower), and c ALSO drops (its neighbor b has a lower id even
    // though b itself was dropped) — the documented greedy contract
    val a = Seq(1f, 0f, 0f)
    val b = Seq(0.95f, 0.3122499f, 0f)  // cos(a,b) ≈ 0.95
    val c = Seq(0.805f, 0.5931845f, 0f) // cos(b,c) ≈ 0.95, cos(a,c) ≈ 0.805
    val d = vecs(10L -> a, 11L -> b, 12L -> c)
    val out = Similarity.semanticDedup(d, nCells = 1, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(10L -> true, 11L -> false, 12L -> false))
  }

  test("quantizeInt8: codes bounded, max component hits ±127, error ≤ half-step") {
    val d = vecs(
      0L -> Seq(0.5f, -1f, 0.25f, 0f),
      1L -> Seq(0f, 0f, 0f, 0f),          // zero vector
      2L -> Seq(3f, 2f, -3f, 1f))
    val out = Similarity.quantizeInt8(d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2))).toList
      .sortBy(_._1)
    val (_, amax0, q0) = out(0)
    assert(amax0 === 1.0)
    assert(q0 === Seq(64, -127, 32, 0))   // floor(±x·127 + 0.5)
    val (_, amaxZ, qZ) = out(1)
    assert(amaxZ === 0.0 && qZ === Seq(0, 0, 0, 0))
    val (_, amax2, q2) = out(2)
    assert(q2.forall(q => q >= -127 && q <= 127))
    assert(q2.max === 127 || q2.min === -127)
    // reconstruction error bound: |x − q·amax/127| ≤ amax/254 (half a step)
    val xs = Seq(3f, 2f, -3f, 1f)
    xs.zip(q2).foreach { case (x, q) =>
      assert(math.abs(x - q * amax2 / 127.0) <= amax2 / 254.0 + 1e-9)
    }
  }

  test("native IntDot == HOF formulation, incl. nulls and length mismatch") {
    import spark.implicits._
    // quantized real embeddings exercise the full int8 code range
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val codes = Similarity.quantizeInt8(emb).select(col("vec_id"), col("q"))
    val pairs = codes.as("a").join(codes.as("b"),
        col("a.vec_id") < col("b.vec_id") && col("a.vec_id") < 5)
      .select(col("a.q").as("qa"), col("b.q").as("qb"))
    val diff = pairs.where(
      Similarity.intDot(col("qa"), col("qb")) =!=
        Similarity.intDotHof(col("qa"), col("qb"))).count()
    assert(diff === 0L)
    // widen-before-multiply: per-element products beyond int range
    val big = Seq((Seq(1000000, 2), Seq(1000000, 3))).toDF("a", "b")
    assert(big.select(Similarity.intDot(col("a"), col("b"))).head.getLong(0)
      === 1000000L * 1000000L + 6L)
    // null element and length mismatch → null (zip_with semantics)
    val edge = Seq(
      (Seq[Integer](1, null), Seq[Integer](2, 3)),
      (Seq[Integer](1), Seq[Integer](2, 3)))
      .toDF("a", "b")
    val r = edge.select(Similarity.intDot(col("a"), col("b"))).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("pqTopK is exact when every candidate is a codeword") {
    // 4 candidates, nCodes = 4 → every candidate's subvectors ARE
    // codewords, encoding is lossless, so ADC ranking == exact dot
    // ranking (scores are the fixed-point dots themselves)
    // all values exactly representable in binary float → the fixed-point
    // element products floor to exact integers
    val d = vecs(
      0L -> Seq(1f, 0f, 0f, 2f),
      1L -> Seq(0.5f, 0.25f, 0.25f, 1.5f),
      2L -> Seq(0f, 1f, 2f, 0f),
      3L -> Seq(-1f, 0f, 0f, -2f))
    val q = d.where(col("vec_id") === 0)
    val pq = Similarity.pqTopK(q, d, k = 3, m = 2, nCodes = 4)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    // exact dots vs v0=(1,0,0,2): v1=0.5+3.0=3.5, v2=0, v3=-5
    assert(pq.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(pq(0)._2 === 3500000L)
    assert(pq(1)._2 === 0L)
    assert(pq(2)._2 === -5000000L)
  }

  test("pqEncode assigns each subvector its nearest codeword") {
    val d = vecs(
      0L -> Seq(1f, 0f, 0f, 0f),   // codeword 0: subs (1,0) / (0,0)
      1L -> Seq(0f, 0f, 1f, 1f),   // codeword 1: subs (0,0) / (1,1)
      2L -> Seq(0.9f, 0.1f, 0.9f, 0.9f)) // sub0 near cw0, sub1 near cw1
    val cb = Similarity.pqCodebook(d, m = 2, nCodes = 2)
    val codes = Similarity.pqEncode(d.where(col("vec_id") === 2), cb, m = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(codes === Map(0 -> 0L, 1 -> 1L))
  }

  test("pqTopK recall vs exact brute force on real data") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 8)
    val brute = Similarity.bruteTopK(q, emb, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(q, emb, k = 5, m = 4, nCodes = 16)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.2, s"PQ recall $recall too low")
  }

  test("ivfPqTopK with nProbe == nCells equals pqTopK (cell filter is a no-op)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(60).cache()
    val q = emb.where(col("vec_id") < 3)
    def collectR(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "score_s", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val pq = collectR(Similarity.pqTopK(q, emb, k = 4, m = 4, nCodes = 8))
    val ivfpq = collectR(Similarity.ivfPqTopK(q, emb, k = 4,
      nCells = 4, nProbe = 4, m = 4, nCodes = 8))
    assert(ivfpq === pq)
  }

  test("hammingTopK: identical vector at distance 0, recall bound on real data") {
    val d = vecs(
      0L -> Seq(1f, -2f, 3f, -4f),
      1L -> Seq(1f, -2f, 3f, -4f),   // identical → all sign bits agree
      2L -> Seq(-1f, 2f, -3f, 4f))   // negated → all projections flip
    val out = Similarity.hammingTopK(d.where(col("vec_id") === 0), d, k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out(0) === ((1L, 0L)))
    assert(out(1)._1 === 2L && out(1)._2 > 0L)

    // the pre-filter contract on real data: Hamming distance must
    // CORRELATE with cosine (true near-neighbors sit measurably closer
    // in sketch space than the population). Top-5 recall is the wrong
    // assert for a 48-bit sketch — the integer distance ties at the
    // k=5 cut are broken arbitrarily; what matters for a pre-filter is
    // the separation (measured ≈ 18.3 vs 24.0 bits on this fixture).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 8)
    val brute = Similarity.bruteTopK(q, emb, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = Similarity.hammingTopK(q, emb, k = Int.MaxValue)
      .select("query_id", "vec_id", "hamming").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val (top, rest) = all.partition(p => brute.contains(p._1))
    def mean(xs: Array[((Long, Long), Long)]) = xs.map(_._2).sum.toDouble / xs.length
    assert(mean(top) < mean(rest) - 3.0,
      s"sketch distances carry no signal: top=${mean(top)} rest=${mean(rest)}")
  }

  test("rrfFuse: consensus candidates outrank single-list tops") {
    import spark.implicits._
    // list A ranks: x=1, y=2; list B ranks: z=1, y=2 — y appears in
    // both (scores 16129+16129) and must beat either single first place
    // (16393)
    val listA = Seq((0L, 10L, 1L), (0L, 20L, 2L)).toDF("query_id", "vec_id", "rank")
    val listB = Seq((0L, 30L, 1L), (0L, 20L, 2L)).toDF("query_id", "vec_id", "rank")
    val out = Similarity.rrfFuse(Seq(listA, listB), k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) === ((20L, 32258L, 2L, 1L)))  // floor(1e6/62)*2
    // the two single-list tops tie at floor(1e6/61) → vec_id breaks it
    assert(out(1) === ((10L, 16393L, 1L, 2L)))
    assert(out(2) === ((30L, 16393L, 1L, 3L)))
  }

  test("quantizedTopK recall vs exact brute force on real data") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 8)
    val brute = Similarity.bruteTopK(q, emb, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedTopK(q, emb, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & quant).size.toDouble / brute.size
    assert(recall >= 0.8, s"int8 recall $recall too low")
  }

  test("zero-norm vectors are excluded from every top-k search path") {
    // without the guard, a zero candidate's cosine is 0/sqrt(0) = NaN
    // and Spark orders NaN ABOVE all doubles — the degenerate vector
    // would be the TOP match for every query
    val d = vecs(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0f, 0f, 0f, 0f), // degenerate
      3L -> Seq(0f, 1f, 0f, 0f))
    val q = d.where(col("vec_id") === 0)
    val paths = Seq(
      "brute" -> Similarity.bruteTopK(q, d, k = 3),
      "quantized" -> Similarity.quantizedTopK(q, d, k = 3),
      "hamming" -> Similarity.hammingTopK(q, d, k = 3, nPlanes = 16))
    for ((name, out) <- paths) {
      val rows = out.orderBy("rank").collect()
      val ids = rows.map(_.getLong(1)).toSet
      assert(!ids.contains(2L), s"$name surfaced the zero vector: $ids")
      assert(rows.head.getLong(1) === 1L, s"$name top match wrong")
    }
    // a zero-norm QUERY yields no rows rather than NaN-ranked garbage
    assert(Similarity.bruteTopK(d.where(col("vec_id") === 2), d, k = 3).count() === 0)
    assert(Similarity.quantizedTopK(d.where(col("vec_id") === 2), d, k = 3).count() === 0)
  }

  test("PQ width contract fails loudly when m does not divide the width") {
    val d = vecs(
      0L -> Seq(1f, 2f, 3f, 4f, 5f), // width 5, m = 2 → trailing dim lost
      1L -> Seq(5f, 4f, 3f, 2f, 1f),
      2L -> Seq(1f, 1f, 1f, 1f, 1f))
    val ex = intercept[Exception] {
      Similarity.pqTopK(d.where(col("vec_id") === 0), d, k = 1, m = 2, nCodes = 2)
        .collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("PQ width contract")),
      s"expected the width-contract error, got: ${messages(ex)}")
  }

  test("hammingTopK rejects nPlanes beyond the expression's 62-bit bound") {
    val d = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
    val ex = intercept[IllegalArgumentException] {
      Similarity.hammingTopK(d.where(col("vec_id") === 0), d, k = 1, nPlanes = 63)
    }
    assert(ex.getMessage.contains("[1, 62]"))
  }

  test("hardNegatives returns only cross-label pairs, nearest first") {
    import spark.implicits._
    val d = Seq(
      (0L, Seq(1f, 0f), "a"),
      (1L, Seq(1f, 0.01f), "a"),   // same label: nearest overall, EXCLUDED
      (2L, Seq(1f, 0.2f), "b"),    // hardest negative
      (3L, Seq(0f, 1f), "b"),      // orthogonal negative
      (4L, Seq(-1f, 0f), "c"))     // opposite negative
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(d.where(col("vec_id") === 0), d, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getString(3), r.getLong(5)))
    assert(out.toSeq === Seq((2L, "b", 1L), (3L, "b", 2L)))
  }

  test("hardNegatives == bruteTopK restricted to cross-label candidates") {
    // the operator is exactly "brute-force top-k over the other-label
    // candidate set": mining per-query against pre-filtered candidates
    // must reproduce it (determinism + ranking contract shared)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 4)
    val mined = Similarity.hardNegatives(q, emb, k = 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val perQuery = q.select("vec_id", "label").collect().flatMap { r =>
      val (qid, qlabel) = (r.getLong(0), r.getInt(1))
      Similarity.bruteTopK(emb.where(col("vec_id") === qid),
          emb.where(col("label") =!= qlabel), k = 5)
        .select("query_id", "vec_id", "rank").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    }.toSet
    assert(mined.nonEmpty, "fixture must yield negatives")
    assert(mined === perQuery)
  }

  test("annRecall: perfect retriever scores 1e6, disjoint scores 0, half scores half") {
    import spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "vec_id")
    val retrieved = Seq(
      (1L, 10L), (1L, 11L), // query 1: both
      (2L, 20L), (2L, 99L), // query 2: one of two
      (3L, 98L)) // query 3: none
      .toDF("query_id", "vec_id")
    val got = graft.similarity.Similarity.annRecall(truth, retrieved)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 1000000L, 2L -> 500000L, 3L -> 0L))
  }

  test("pairwiseDiversity: collapsed → scale, antipodal → −scale, sample-gated") {
    import spark.implicits._
    def div(rows: (Long, Seq[Float])*) =
      graft.similarity.Similarity.pairwiseDiversity(
        rows.toDF("vec_id", "embedding")).collect().head
    val collapsed = div(0L -> Seq(1.0f, 0.0f), 11L -> Seq(3.0f, 0.0f),
      22L -> Seq(0.5f, 0.0f))
    assert((collapsed.getLong(0), collapsed.getLong(1)) === ((3L, 1000000L)))
    val antipodal = div(0L -> Seq(1.0f, 0.0f), 11L -> Seq(-1.0f, 0.0f))
    assert((antipodal.getLong(0), antipodal.getLong(1)) === ((1L, -1000000L)))
    val orthogonal = div(0L -> Seq(1.0f, 0.0f), 11L -> Seq(0.0f, 1.0f))
    assert((orthogonal.getLong(0), orthogonal.getLong(1)) === ((1L, 0L)))
    // id 5 is off the mod-11 sample: the antipode it would add must
    // not register
    val gated = div(0L -> Seq(1.0f, 0.0f), 11L -> Seq(1.0f, 0.0f),
      5L -> Seq(-1.0f, 0.0f))
    assert((gated.getLong(0), gated.getLong(1)) === ((1L, 1000000L)))
  }

  test("mrr: first-hit rank drives the reciprocal, misses score 0") {
    import spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
      .toDF("query_id", "vec_id")
    val retrieved = Seq(
      (1L, 99L, 1L), (1L, 11L, 2L), (1L, 10L, 3L), // first hit at rank 2
      (2L, 20L, 1L),                               // immediate hit
      (3L, 98L, 1L), (3L, 97L, 2L))                // total miss
      .toDF("query_id", "vec_id", "rank")
    val got = graft.similarity.Similarity.mrr(truth, retrieved)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getLong(2))).toMap
    assert(got === Map(1L -> ((2L, 500000L)), 2L -> ((1L, 1000000L)),
      3L -> ((-1L, 0L))))
  }

  test("embeddingDrift: identical slices drift 0; a shifted dim shows its shift") {
    import spark.implicits._
    val ref = Seq((1L, Seq(0.5, -0.25)), (2L, Seq(0.5, -0.25)))
      .toDF("vec_id", "embedding")
    // dim 0 identical, dim 1 shifted by +0.5 in cur
    val cur = Seq((3L, Seq(0.5, 0.25)), (4L, Seq(0.5, 0.25)))
      .toDF("vec_id", "embedding")
    val got = graft.similarity.Similarity.embeddingDrift(ref, cur)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(0L) === ((500000L, 500000L, 0L)))
    assert(got(1L) === ((-250000L, 250000L, 500000L)))
    // empty side: null means, no crash
    val empty = graft.similarity.Similarity
      .embeddingDrift(ref, cur.where(col("vec_id") < 0)).collect()
    assert(empty.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("marginMine demotes hubs: best margin can differ from best cosine") {
    // three orthonormal probes; y1 is a HUB (cos 0.55 to every probe),
    // y2 a genuine mate of x=100 (cos 0.5 to it, 0 elsewhere). Raw
    // cosine ranks the hub first for x=100; the margin criterion
    // subtracts the hub's big backward neighborhood sum and flips the
    // order — the reason margin mining exists
    val xs = vecs(
      100L -> Seq(1f, 0f, 0f, 0f),
      200L -> Seq(0f, 1f, 0f, 0f),
      300L -> Seq(0f, 0f, 1f, 0f))
    val ys = vecs(
      1L -> Seq(1f, 1f, 1f, 0.553f), // hub
      2L -> Seq(0.5f, 0f, 0f, 0.866f)) // mate of 100
    val out = graft.similarity.Similarity.marginMine(xs, ys, k = 2, topPairs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(4)) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val (top100, topCos, topMargin) = out((100L, 1L))
    assert(top100 === 2L, "mate outranks the hub on margin")
    // but the hub wins on raw cosine — the two orders genuinely differ
    val (second, secondCos, _) = out((100L, 2L))
    assert(second === 1L)
    assert(secondCos > topCos, "hub has the higher raw cosine")
    assert(topMargin > out((100L, 2L))._3)
    // probes without a genuine mate still rank the hub first
    assert(out((200L, 1L))._1 === 1L)
    assert(out((300L, 1L))._1 === 1L)
  }
}

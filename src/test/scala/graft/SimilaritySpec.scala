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
}

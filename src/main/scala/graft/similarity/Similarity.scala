package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Numeric determinism: dot products and norms are computed in
  * *fixed-point*: each element product is floored to 1e-6 precision and
  * summed as BIGINT. Element-wise floor-then-sum is order-independent
  * and bit-exact across engines (float→double cast is exact, double
  * multiply is IEEE-defined), so cosine scores — and therefore top-k
  * membership and thresholds — reproduce exactly in the DuckDB oracle.
  *
  * Scale design:
  *  - brute-force top-k broadcasts the (small) query set and computes
  *    scores map-side; ranking shuffles only (query, candidate, score)
  *    triples, never embeddings;
  *  - the LSH path buckets vectors by random-hyperplane sign bits
  *    (deterministic integer pseudo-hyperplanes), so query-time work is
  *    an equi-join on bucket keys — at 100 TB the full-scan path is gone
  *    and each probe touches |bucket| vectors.
  */
object Similarity {

  /** Fixed-point (1e-6) dot product of two float/double-array columns.
    * Backed by the native codegen'd expression
    * (graft.expressions.FixedPointDot) — one fused JIT'd loop instead of
    * interpreted zip_with+aggregate lambdas; [[dotFpHof]] keeps the HOF
    * formulation for the parity spec.
    */
  def dotFp(a: Column, b: Column): Column =
    graft.expressions.FixedPointDot(a, b)

  /** The higher-order-function formulation of [[dotFp]] (executable
    * documentation of the semantics; spec-tested equal).
    */
  def dotFpHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast("double") * y.cast("double") * lit(1000000.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Fixed-point squared norm. */
  def normFp(a: Column): Column = dotFp(a, a)

  /** Integer dot product of two int-array columns (the int8-code
    * scoring loop). Backed by the native codegen'd expression
    * (graft.expressions.IntDot); [[intDotHof]] keeps the HOF
    * formulation for the parity spec.
    */
  def intDot(a: Column, b: Column): Column =
    graft.expressions.IntDot(a, b)

  /** The higher-order-function formulation of [[intDot]] (executable
    * documentation of the semantics; spec-tested equal).
    */
  def intDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Cosine from fixed-point parts — deterministic double, and TOTAL:
    * when either norm is zero the cosine is undefined and the −2
    * sentinel (below any real cosine) is returned, so degenerate
    * vectors rank last, never clear a similarity threshold, and
    * tie-break deterministically in assignments. The guard is not
    * cosmetic: under Spark's default ANSI mode an unguarded 0/0 does
    * not produce NaN — it THROWS DIVIDE_BY_ZERO and kills the whole
    * job on the first corrupt row.
    */
  def cosine(dot: Column, n1: Column, n2: Column): Column =
    when(n1 > 0 && n2 > 0,
      dot.cast("double") / sqrt(n1.cast("double") * n2.cast("double")))
      .otherwise(lit(-2.0))

  /** Brute-force cosine top-k: for every query vector, the k most
    * similar non-identical vectors. Queries are broadcast; candidates
    * stream. Returns (query_id, vec_id, cosine, rank).
    *
    * Degenerate (all-zero) vectors have no defined cosine — 0/sqrt(0)
    * is NaN, which Spark orders ABOVE every double, so without a guard
    * a zero vector would rank as the top match for every query. Both
    * sides therefore drop zero-norm rows before scoring (the family
    * contract, shared by [[quantizedTopK]] and [[hammingTopK]]).
    */
  def bruteTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      normFp(col("embedding")).as("q_norm"))
      .where(col("q_norm") > 0)
    val c = candidates.select(col("vec_id"), col("embedding").as("c_emb"),
      normFp(col("embedding")).as("c_norm"))
      .where(col("c_norm") > 0)
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(dotFp(col("q_emb"), col("c_emb")), col("q_norm"), col("c_norm"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training data: for every
    * query vector, the k most cosine-similar candidates carrying a
    * DIFFERENT label — the negatives closest to the decision boundary,
    * which a contrastive/triplet loss learns most from (a uniformly
    * random negative is usually already far away and contributes ~zero
    * gradient). Returns (query_id, query_label, vec_id, neg_label,
    * cosine, rank).
    *
    * Same contracts as [[bruteTopK]]: queries broadcast, candidates
    * stream, zero-norm rows dropped on both sides, (cosine desc,
    * vec_id) ranking is total so results are deterministic. The
    * label-inequality predicate rides the broadcast join itself, so
    * same-label pairs never reach the ranking window. Scale path: this
    * is the exact face; over a full corpus compose with [[assignCells]]
    * exactly like [[ivfTopK]] — probe nearest cells, then apply the
    * cross-label filter inside the probed cells only.
    */
  def hardNegatives(queries: DataFrame, candidates: DataFrame, k: Int,
      labelCol: String = "label"): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col(labelCol).as("query_label"), col("embedding").as("q_emb"),
      normFp(col("embedding")).as("q_norm"))
      .where(col("q_norm") > 0)
    val c = candidates.select(col("vec_id"), col(labelCol).as("neg_label"),
      col("embedding").as("c_emb"), normFp(col("embedding")).as("c_norm"))
      .where(col("c_norm") > 0)
    val scored = c.join(broadcast(q), col("query_label") =!= col("neg_label"))
      .select(col("query_id"), col("query_label"), col("vec_id"), col("neg_label"),
        cosine(dotFp(col("q_emb"), col("c_emb")), col("q_norm"), col("c_norm"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * Knuth multiplicative hash centered on zero. Pure integer math —
    * identical in any engine.
    */
  private def planeWeight(plane: Int, dim: Column): Column =
    ((lit(plane.toLong * 64L + 1L) + dim) * 2654435761L) % 1000003L - 501001L

  /** Sign-bit bucket key from `nPlanes` hyperplanes. Backed by the
    * native codegen'd expression (graft.expressions.LshBucket) — one
    * fused pass over the array for all planes; [[lshBucketHof]] keeps
    * the HOF formulation for the parity spec.
    */
  def lshBucket(emb: Column, nPlanes: Int): Column =
    graft.expressions.LshBucket(emb, nPlanes)

  /** The higher-order-function formulation of [[lshBucket]] (executable
    * documentation of the semantics; spec-tested equal).
    */
  def lshBucketHof(emb: Column, nPlanes: Int): Column = {
    val dims = sequence(lit(0), size(emb) - 1)
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(emb, dims, (x, d) =>
          floor(x.cast("double") * planeWeight(p, d).cast("double")).cast("long")),
        lit(0L), (acc, x) => acc + x)
      when(proj > 0L, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via hyperplane LSH: candidates are restricted to vectors
    * sharing the query's bucket in any of the `tables` independent
    * hash tables (standard multi-table LSH to boost recall). Same output
    * shape as bruteTopK; recall < 1 by construction.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nPlanes: Int = 4, tables: Int = 8): DataFrame = {
    def bucketed(df: DataFrame, idCol: String): DataFrame = {
      val tableExprs = (0 until tables).map(t =>
        struct(lit(t).as("table"), lshBucket(shuffleForTable(col("embedding"), t), nPlanes).as("bucket")))
      df.select(col("vec_id").as(idCol), col("embedding").as(s"${idCol}_emb"),
          explode(array(tableExprs: _*)).as("tb"))
        .select(col(idCol), col(s"${idCol}_emb"), col("tb.table").as("table"),
          col("tb.bucket").as("bucket"))
    }
    val qb = bucketed(queries, "query_id")
    val cb = bucketed(candidates, "vec_id")
    // dedup candidate id pairs BEFORE touching embeddings: distinct on two
    // longs, not on wide float arrays, then join embeddings back once
    val pairs = cb.drop("vec_id_emb").join(broadcast(qb.drop("query_id_emb")),
        Seq("table", "bucket"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      normFp(col("embedding")).as("q_norm"))
    val c = candidates.select(col("vec_id"), col("embedding").as("c_emb"),
      normFp(col("embedding")).as("c_norm"))
    val scored = pairs
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(dotFp(col("q_emb"), col("c_emb")), col("q_norm"), col("c_norm"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Distinct per-table view of the embedding: rotate elements by t so
    * each LSH table sees effectively independent hyperplanes. The tail
    * slice length is derived from size(emb) (to-end semantics, matching
    * the DuckDB twin `embedding[7t+1:]`) — never a literal cap that
    * would silently break rotation independence for very wide vectors.
    */
  private def shuffleForTable(emb: Column, t: Int): Column =
    if (t == 0) emb
    else concat(
      slice(emb, lit(t * 7 + 1), greatest(size(emb) - lit(t * 7), lit(0))),
      slice(emb, lit(1), lit(t * 7)))

  /** Deterministic Lloyd refinement shared by [[ivfTopK]],
    * [[kmeansAssign]] and [[kmeansSummary]]. Seed centroids are the
    * `nCells` lowest-id vectors; each pass reassigns every vector to
    * its max-cosine cell and moves the centroid to the fixed-point
    * element-wise mean of its members (cells that lose every member
    * keep their previous centroid, the standard k-means convention).
    * Returns (cell_id, cell_emb, cell_norm).
    *
    * Per-dimension sums are FIXED-POINT (floor to 1e-6 as BIGINT —
    * order-independent, oracle-exact); the explode shuffles (cell, dim)
    * keys only — nCells·dims groups, partial-aggregated map-side,
    * regardless of candidate count.
    */
  private def lloydCells(candidates: DataFrame, nCells: Int, iters: Int): DataFrame = {
    val seeds = candidates.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cell_id"),
        transform(col("embedding"), x => x.cast("double")).as("cell_emb"))
    var cells = seeds
      .select(col("cell_id"), col("cell_emb"), normFp(col("cell_emb")).as("cell_norm"))
    for (_ <- 0 until iters) {
      val refined = assignCells(candidates, cells)
        .select(col("cell_id"), posexplode(col("c_emb")))
        .groupBy("cell_id", "pos")
        .agg(sum(floor(col("col").cast("double") * lit(1000000.0)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .select(col("cell_id"), col("pos"),
          (col("s").cast("double") / (lit(1000000.0) * col("n").cast("double"))).as("m"))
        .groupBy("cell_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("new_emb"))
      // a cell that lost every member keeps its PREVIOUS centroid (join
      // against the current `cells`, not the seeds — with 2+ iterations
      // falling back to the seed would silently rewind the cell)
      cells = cells.select(col("cell_id"), col("cell_emb"))
        .join(refined, Seq("cell_id"), "left")
        .select(col("cell_id"), coalesce(col("new_emb"), col("cell_emb")).as("cell_emb"))
        .select(col("cell_id"), col("cell_emb"), normFp(col("cell_emb")).as("cell_norm"))
    }
    cells
  }

  /** Rank-1 cell assignment as a max_by AGGREGATION, not a row_number
    * window: partial aggregation collapses the |vectors|·nCells scored
    * rows map-side to one row per vector, so the shuffle carries
    * |vectors| rows and nothing is sorted — the window form would
    * shuffle and sort all nCells copies of every vector. Tie-break
    * (highest cosine, then lowest cell_id) via lexicographic struct
    * max. Returns (vec_id, cell_id, ccos, c_emb, c_norm) where
    * c_emb/c_norm are the MEMBER vector's own embedding and norm
    * (carried through the aggregation so Lloyd averaging and the IVF
    * scan never re-join the vector table).
    */
  private def assignCells(vectors: DataFrame, cells: DataFrame): DataFrame =
    vectors.select(col("vec_id"), col("embedding"), normFp(col("embedding")).as("_norm"))
      .join(broadcast(cells))
      .withColumn("_cos", cosine(dotFp(col("embedding"), col("cell_emb")),
        col("_norm"), col("cell_norm")))
      .groupBy("vec_id")
      .agg(max_by(
        struct(col("embedding").as("c_emb"), col("_norm").as("c_norm"),
          col("cell_id"), col("_cos").as("ccos")),
        struct(col("_cos").as("c"), (-col("cell_id")).as("nid"))).as("_a"))
      .select(col("vec_id"), col("_a.cell_id").as("cell_id"),
        col("_a.ccos").as("ccos"), col("_a.c_emb").as("c_emb"),
        col("_a.c_norm").as("c_norm"))

  /** Standalone k-means data map: every vector labelled with its
    * cluster after `iters` deterministic Lloyd passes, plus its cosine
    * to the final centroid floor-scaled to 1e-6 (`ccos_s`) — the
    * membership + confidence table that curriculum buckets, SemDeDup
    * cells and corpus data maps are built from. Returns
    * (vec_id, cell_id, ccos_s).
    *
    * Scale shape: centroids are nCells·dims values, always broadcast;
    * the only per-vector shuffle is the max_by partial aggregation, so
    * vectors are scored map-side and embeddings never shuffle.
    * Degenerate zero-norm vectors take the −2 cosine sentinel and
    * land deterministically in the lowest cell id.
    */
  def kmeansAssign(vectors: DataFrame, nCells: Int = 16, iters: Int = 2): DataFrame =
    assignCells(vectors, lloydCells(vectors, nCells, iters))
      .select(col("vec_id"), col("cell_id"),
        floor(col("ccos") * lit(1000000.0)).cast("long").as("ccos_s"))

  /** Per-cluster cohesion summary over [[kmeansAssign]]: member count
    * and summed fixed-point centroid cosine (the spherical-k-means
    * analogue of inertia — higher = tighter cell). One nCells-row
    * table; the grouped aggregation is partial-agged map-side.
    */
  def kmeansSummary(vectors: DataFrame, nCells: Int = 16, iters: Int = 2): DataFrame =
    kmeansAssign(vectors, nCells, iters)
      .groupBy("cell_id")
      .agg(count(lit(1)).as("n_vecs"), sum(col("ccos_s")).as("sum_ccos_s"))

  /** IVF (inverted-file) ANN: vectors are assigned to their
    * nearest-centroid cell once; a query scans only its `nProbe`
    * nearest cells. Seed centroids are the `nCells` lowest-id vectors;
    * `kmeansIters` Lloyd refinement passes move them to the
    * (deterministic, fixed-point) element-wise means of their assigned
    * vectors — cells that lose every member keep their previous
    * centroid, the standard k-means convention. Cells are broadcast to
    * both assignment passes; the scan is an equi-join on cell id, so
    * query cost is |cell|·nProbe instead of |candidates|.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, kmeansIters: Int = 0): DataFrame = {
    val cells = lloydCells(candidates, nCells, kmeansIters)
    def withCellCos(df: DataFrame, idCol: String, cs: DataFrame): DataFrame =
      df.select(col(idCol), col("embedding"), normFp(col("embedding")).as("_norm"))
        .join(broadcast(cs))
        .withColumn("_cos", cosine(dotFp(col("embedding"), col("cell_emb")),
          col("_norm"), col("cell_norm")))
    val assigned = assignCells(candidates, cells)
      .select(col("vec_id"), col("c_emb"), col("c_norm"), col("cell_id"))
    // the query side genuinely needs the top-nProbe cells per query →
    // keep the window there (query sets are small by construction)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("cell_id"))
    val probed = withCellCos(
        queries.select(col("vec_id").as("query_id"), col("embedding")), "query_id", cells)
      .withColumn("_rank", row_number().over(probeW))
      .where(col("_rank") <= nProbe)
      .select(col("query_id"), col("embedding").as("q_emb"),
        col("_norm").as("q_norm"), col("cell_id"))
    val scored = probed.join(assigned, Seq("cell_id"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(dotFp(col("q_emb"), col("c_emb")), col("q_norm"), col("c_norm"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Near-duplicate pairs by embedding cosine within `blockCol` blocks
    * (e.g. a coarse cluster/label/IVF-centroid assignment): self-join on
    * the block key, threshold on exact fixed-point cosine. The block key
    * bounds the quadratic term exactly like LSH bands do for MinHash.
    */
  /** Matryoshka truncate-and-renormalize: keep the first `dims`
    * components and L2-normalize the prefix — the consumption pattern
    * for nested-representation embeddings (serve a cheap prefix, keep
    * the full vector at rest). The norm comes from the FIXED-POINT
    * self-dot of the prefix, so the scale factor is exact and identical
    * on any engine/partitioning; components then divide in double and
    * round once back to float. Zero vectors pass through unscaled
    * (no NaN). Map-only.
    */
  def truncateNormalize(vectors: DataFrame, dims: Int): DataFrame = {
    require(dims > 0, "dims must be positive")
    val prefix = slice(col("embedding"), 1, dims)
    val normS = dotFp(prefix, prefix)
    vectors.select(col("vec_id"), prefix.as("emb_t"), normS.as("norm_s"))
      .select(col("vec_id"),
        when(col("norm_s") > 0L,
          transform(col("emb_t"), x =>
            (x.cast("double") /
              sqrt(col("norm_s").cast("double") / 1000000.0)).cast("float")))
          .otherwise(col("emb_t")).as("embedding"))
  }

  /** Per-group embedding centroid statistics — the aggregate behind
    * IVF seeding, cluster drift monitoring, and per-domain embedding
    * diagnostics: for every (group, dimension), the vector count and
    * the EXACT fixed-point component sum (each float component is
    * floor-scaled to a 1e6 integer before summing, the engine's
    * standard order-independent-sum contract — a float sum would depend
    * on reduction order and break cross-engine/rerun determinism).
    * Callers derive the centroid as `sum_s / 1e6 / n_vecs`.
    *
    * Scale shape: posexplode then ONE partial-aggregated groupBy on
    * (group, dim) — map-side combine reduces each partition to
    * |groups|·|dims| rows before the only shuffle; no window, no
    * collect, dimension count is the natural parallelism multiplier.
    */
  def centroidStats(vectors: DataFrame, groupCol: String = "label"): DataFrame =
    vectors
      .select(col(groupCol), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col(groupCol), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("x").cast("double") * 1000000.0).cast("long")).as("sum_s"))

  /** Rank-1 nearest-centroid cell assignment against the `nCells`
    * lowest-id vectors (the deterministic IVF seeding rule): returns
    * (vec_id, cell_id). Shared by [[semanticDedup]]; the same max_by
    * aggregation shape as the IVF path — the |vectors|·nCells scored
    * rows collapse map-side, the shuffle carries one row per vector and
    * nothing is sorted.
    */
  def assignCells(vectors: DataFrame, nCells: Int): DataFrame = {
    val cells = vectors.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cell_id"),
        transform(col("embedding"), x => x.cast("double")).as("cell_emb"))
      .select(col("cell_id"), col("cell_emb"), normFp(col("cell_emb")).as("cell_norm"))
    vectors.select(col("vec_id"), col("embedding"), normFp(col("embedding")).as("_norm"))
      .join(broadcast(cells))
      .withColumn("_cos", cosine(dotFp(col("embedding"), col("cell_emb")),
        col("_norm"), col("cell_norm")))
      .groupBy("vec_id")
      .agg(max_by(col("cell_id"),
        struct(col("_cos").as("c"), (-col("cell_id")).as("nid"))).as("cell_id"))
  }

  /** SemDeDup-style semantic deduplication: cluster the corpus into
    * nearest-centroid cells, compute pairwise cosine only WITHIN each
    * cell, and drop every vector that has a higher-similarity-than-
    * `threshold` neighbor with a lower id (the lowest-id member of each
    * near-dup neighborhood survives as the representative). Returns one
    * row per input vector: (vec_id, cell_id, keep).
    *
    * Scale shape: the cell key bounds the quadratic pairing term exactly
    * as in the SemDeDup paper — the self-join is an equi-join on
    * cell_id, never a corpus cartesian (the global no-cartesian plan
    * gate applies); centroids broadcast; the drop set joins back by
    * vec_id only. Deterministic by the engine's fixed-point cosine
    * contract, so fully oracle-checkable.
    */
  def semanticDedup(vectors: DataFrame, nCells: Int = 16,
      threshold: Double = 0.35): DataFrame = {
    val assigned = vectors.join(assignCells(vectors, nCells), "vec_id")
    val dropped = nearDupPairs(assigned, "cell_id", threshold)
      .select(col("vec_id_b").as("vec_id")).distinct()
      .withColumn("_drop", lit(true))
    assigned.select("vec_id", "cell_id")
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        not(coalesce(col("_drop"), lit(false))).as("keep"))
  }

  /** Symmetric int8 scalar quantization: each vector is scaled by its
    * own max-abs component so q = floor(x·127/amax + 0.5) ∈ [−127, 127]
    * (half-up rounding written as floor(+0.5) — identical in any IEEE
    * engine, unlike round() whose negative-half convention varies).
    * Returns (vec_id, amax, q: array<int>). A zero vector quantizes to
    * zeros with amax = 0. 4× smaller at rest than float32, 16× smaller
    * than the doubles they expand to — the difference between an ANN
    * index that fits executor memory at 100 TB and one that spills.
    * Map-only; every arithmetic step (float→double cast, one multiply,
    * one divide, floor) is IEEE-exact, so the codes are oracle-exact.
    */
  def quantizeInt8(vectors: DataFrame): DataFrame = {
    val amax = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    vectors.select(col("vec_id"), col("embedding"), amax.as("amax"))
      .select(col("vec_id"), col("amax"),
        when(col("amax") > 0d,
          transform(col("embedding"), x =>
            floor(x.cast("double") * lit(127.0) / col("amax") + lit(0.5)).cast("int")))
          .otherwise(transform(col("embedding"), x => lit(0))).as("q"))
  }

  /** Sign random projection (Achlioptas 2003 / Johnson–Lindenstrauss):
    * reduce each vector to `outDims` coordinates via a deterministic
    * ±1 matrix, out_j = Σ_i s(i,j)·q_i — the dimensionality-reduction
    * step in front of clustering or coarse ANN when even int8 codes at
    * the native width are too wide to shuffle. ±1 entries (not
    * Gaussians) keep the projection CLOSED UNDER INTEGER ARITHMETIC:
    * projecting the int8-quantized codes ([[quantizeInt8]]) makes every
    * output an exact BIGINT, engine- and order-independent, while the
    * JL guarantee (pairwise distances preserved within 1±ε for
    * outDims ≍ log n / ε²) holds for ±1 entries exactly as for
    * Gaussian ones.
    *
    * The sign matrix is never materialized: s(i,j) is the parity of
    * the iterated mid-square hash of the cell key i·4096 + j (the
    * [[graft.sketch.Sketches]] portable-hash ladder — nonlinear, so
    * sequential dims don't stripe), recomputed per term in any engine.
    *
    * Scale shape: MAP-ONLY — one fused native kernel per row
    * ([[graft.expressions.SignProjectCodes]], whole-stage codegen);
    * nothing shuffles. Output is flat (vec_id, dim, proj) rows. The
    * nested-HOF formulation survives as [[signProjectHof]], the
    * spec-only parity witness — nested lambdas are CodegenFallback and
    * re-evaluate the sign tree per term (measured 20.2 s vs 0.4 s at
    * sf0.1), the BPE frozen-vs-native precedent.
    */
  def signProject(vectors: DataFrame, outDims: Int): DataFrame = {
    require(outDims >= 1 && outDims <= 4096,
      s"outDims must be in [1, 4096], got $outDims")
    quantizeInt8(vectors)
      .select(col("vec_id"),
        graft.expressions.SignProjectCodes(col("q"), outDims).as("proj"))
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "proj")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("proj"))
  }

  /** Nested-HOF twin of [[signProject]] — SPEC-ONLY parity witness for
    * the native kernel (identical output by SignProjectSpec); keep out
    * of query faces: CodegenFallback per-term evaluation.
    */
  def signProjectHof(vectors: DataFrame, outDims: Int): DataFrame = {
    require(outDims >= 1 && outDims <= 4096,
      s"outDims must be in [1, 4096], got $outDims")
    val p = 2147483647L // 2^31-1: mid-square modulus, intermediates < 2^62
    val sign = // parity of h2(h1(x)), x = i·4096 + j < 2^31
      s"""((((CAST(i AS BIGINT) * 4096 + j) * (CAST(i AS BIGINT) * 4096 + j)
         |    + 12345) % $p)
         |  * (((CAST(i AS BIGINT) * 4096 + j) * (CAST(i AS BIGINT) * 4096 + j)
         |    + 12345) % $p)
         |  + 6789) % $p % 2""".stripMargin.replace("\n", " ")
    quantizeInt8(vectors)
      .select(col("vec_id"), expr(
        s"""transform(sequence(0, ${outDims - 1}), j ->
           |  aggregate(
           |    zip_with(q, sequence(0, size(q) - 1), (x, i) ->
           |      CASE WHEN $sign = 0 THEN CAST(x AS BIGINT)
           |           ELSE -CAST(x AS BIGINT) END),
           |    CAST(0 AS BIGINT), (acc, t) -> acc + t))""".stripMargin)
        .as("proj"))
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "proj")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("proj"))
  }

  /** Greedy k-center coreset (Gonzalez's farthest-first traversal):
    * pick k maximally-diverse vectors — each round selects the vector
    * LEAST similar to everything already selected (min over candidates
    * of max-similarity-to-selected, the 2-approximation to the optimal
    * k-center cover). The diversity-sampling step of a data pipeline:
    * seed vectors for IVF/k-means that cover the space, exemplar picks
    * for labeling budgets, "show me k genuinely different documents".
    *
    * Similarity is the SIGNED SQUARED cosine over int8 codes,
    *   sim_s = (dot·|dot|·scale) div (‖a‖²·‖b‖²)
    * — monotone in cosine (x·|x| preserves order and sign) and closed
    * under integer arithmetic (true cosine needs irrational norms), so
    * selection is engine-exact. Ties break to the lowest vec_id; the
    * traversal starts from the lowest nonzero-norm vec_id (a
    * deterministic anchor — farthest-first is a 2-approximation from
    * ANY start). Zero-norm vectors are excluded (no direction).
    *
    * Scale shape: per round ONE map-only pass — every selected code
    * re-enters the plan as a literal array (the GD-weights pattern,
    * k·dims ints total) and the max-over-selected is a `greatest` of
    * k native [[graft.expressions.IntDot]] columns — followed by a
    * TakeOrdered(1) argmin (no full sort) and a 1-row collect (the BPE
    * top-pair budget). Nothing shuffles but the argmin's single row.
    *
    * Overflow: |dot| ≤ dims·127², so dot²·scale needs
    * dims²·127⁴·scale < 2⁶³ — dims ≤ 512 at the default scale; wider
    * vectors lower `scale` (the fixed-point family note).
    */
  /** The nonzero-norm int8 code table every k-centers pass scans. */
  private def kCenterCodes(vectors: DataFrame): DataFrame =
    quantizeInt8(vectors)
      .select(col("vec_id"), col("q"),
        graft.expressions.IntDot(col("q"), col("q")).as("n2"))
      .where(col("n2") > 0)

  /** The farthest-first traversal over an ALREADY-PERSISTED code table —
    * shared by [[kCenters]] and [[kCentersCover]] (r13: the cover face
    * previously re-ran kCenters end to end, paying a second quantize
    * pass and re-collecting the center codes it already had in hand).
    * Returns (sel_round, vec_id, max_sim) picks WITH their codes.
    */
  private def kCenterTraversal(q: DataFrame, k: Int, scale: Long)
      : (Vector[(Long, Long, Option[Long])], Vector[(Seq[Int], Long)]) = {
    val firstRow = q.orderBy(col("vec_id"))
      .select(col("vec_id"), col("n2"), col("q")).head(1)
    require(firstRow.nonEmpty, "no nonzero-norm vectors to select from")
    val first = firstRow.head.getLong(0)
    // (round, vec_id, max sim to the previously selected; null for the
    // deterministic anchor); picks carry their code in the same 1-row
    // collect, so no per-center lookup job
    var selected = Vector((1L, first, Option.empty[Long]))
    var codes = Vector((firstRow.head.getSeq[Int](2), firstRow.head.getLong(1)))
    for (r <- 2 to k) {
      val simCols = codes.map { case (code, cn2) =>
        val d = graft.expressions.IntDot(col("q"), typedLit(code))
        graft.ml.Training.floorDivP(d * abs(d) * scale, col("n2") * lit(cn2))
      }
      val maxSim =
        if (simCols.size == 1) simCols.head else greatest(simCols: _*)
      val already = selected.map(_._2)
      val pick = q.where(!col("vec_id").isin(already.map(x => x: Any): _*))
        .select(col("vec_id"), col("n2"), col("q"), maxSim.as("max_sim_s"))
        .orderBy(col("max_sim_s").asc, col("vec_id").asc)
        .head(1)
      if (pick.nonEmpty) {
        val row = pick.head
        selected :+= ((r.toLong, row.getLong(0), Some(row.getLong(3))))
        codes :+= ((row.getSeq[Int](2), row.getLong(1)))
      }
    }
    (selected, codes)
  }

  def kCenters(vectors: DataFrame, k: Int,
      scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(scale > 0, s"scale must be positive, got $scale")
    val spark = vectors.sparkSession
    import spark.implicits._
    val q = kCenterCodes(vectors)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (selected, _) = kCenterTraversal(q, k, scale)
    q.unpersist()
    selected.map { case (r, id, s) => (r, id, s) }
      .toDF("sel_round", "vec_id", "max_sim_s")
  }

  /** Coverage report for a [[kCenters]] selection: assign every vector
    * to its most-similar center (argmax signed-squared cosine, ties to
    * the LOWEST selection round — the first-match fold, mirrored by
    * the twin's CASE ladder) and report per-center mass and the WORST
    * assigned similarity — the k-center objective itself: min over
    * centers of min_assigned sim is how well k exemplars cover the
    * corpus, the number that says whether k was enough.
    *
    * Scale shape: re-runs the traversal (k bounded passes), then ONE
    * map-only assignment pass — all k center codes re-enter as literal
    * arrays, best-of-k is `greatest` over native IntDot columns — and
    * one |k|-keyed partial-aggregated groupBy. Vectors never shuffle;
    * only (center, sim) pairs do.
    */
  def kCentersCover(vectors: DataFrame, k: Int,
      scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(scale > 0, s"scale must be positive, got $scale")
    // r13: ONE persisted code table serves the traversal AND the
    // assignment pass, and the traversal already returns every center's
    // code — the previous shape re-ran kCenters (second quantize pass)
    // and then re-collected the codes it had just discarded.
    val q = kCenterCodes(vectors)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (selected, codes) = kCenterTraversal(q, k, scale)
    val simCols = selected.zip(codes).map { case ((round, _, _), (code, cn2)) =>
      val d = graft.expressions.IntDot(col("q"), typedLit(code))
      round -> graft.ml.Training.floorDivP(d * abs(d) * scale,
        col("n2") * lit(cn2))
    }
    val best = if (simCols.size == 1) simCols.head._2
      else greatest(simCols.map(_._2): _*)
    // first (lowest-round) match wins ties, like the twin's CASE ladder
    val center = simCols.reverse.foldLeft(lit(0L)) { case (acc, (round, s)) =>
      when(s === best, lit(round)).otherwise(acc)
    }
    // materialize the ≤k-row report off the per-call cache, then release
    // it — the traversal's head() jobs already warmed every partition
    val out = q.select(center.as("center_round"), best.as("sim_s"))
      .groupBy(col("center_round"))
      .agg(count(lit(1)).as("n_assigned"), min(col("sim_s")).as("min_sim_s"))
      .localCheckpoint()
    q.unpersist()
    out
  }

  /** Brute-force top-k over int8-QUANTIZED vectors — the compressed
    * search path: scores are integer code dots normalized by integer
    * code norms (Σq², exact BIGINT arithmetic — scale factors cancel in
    * the cosine, so amax never enters the score). Same output shape and
    * tie-break as [[bruteTopK]]; recall < 1 by quantization error
    * (bounded in SimilaritySpec). Queries broadcast; candidates stream;
    * only (query, candidate, score) triples shuffle for ranking.
    * Zero vectors quantize to all-zero codes (amax=0), whose qcosine
    * would be 0/sqrt(0) = NaN — NaN-above-all ordering would rank them
    * TOP for every query, so both sides drop zero-code-norm rows
    * before scoring (same guard as [[bruteTopK]]).
    */
  def quantizedTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = quantizeInt8(queries).select(col("vec_id").as("query_id"),
      col("q").as("q_q"))
      .where(intDot(col("q_q"), col("q_q")) > 0)
    val c = quantizeInt8(candidates).select(col("vec_id"), col("q").as("q_c"))
      .where(intDot(col("q_c"), col("q_c")) > 0)
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (intDot(col("q_q"), col("q_c")).cast("double") /
          sqrt(intDot(col("q_q"), col("q_q")).cast("double") *
            intDot(col("q_c"), col("q_c")).cast("double"))).as("qcosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Margin-based candidate mining over two vector sets (the
    * Artetxe–Schwenk bitext-mining criterion): a raw nearest-neighbor
    * score can't separate "y is genuinely x's match" from "y is close
    * to EVERYTHING" (hubness), so each pair is scored relative to both
    * endpoints' neighborhoods:
    *
    *   margin(x,y) = cos(x,y) − (avgₖ fwd(x) + avgₖ bwd(y)) / 2
    *
    * Emitted ×2k-scaled so the whole criterion stays in exact integer
    * arithmetic: margin_s = 2k·cos_s − sumFwdₖ(x) − sumBwdₖ(y), with
    * cos_s = ⌊1e6·dot/√(n_x·n_y)⌋ over int8-quantized codes — every
    * step (integer dot, one double sqrt, one division, floor) is
    * IEEE-exact, and the k-sums add integers, so ties and ranks are
    * engine-portable. Returns the `topPairs` best-margin candidates per
    * x: (src_id, dst_id, cos_s, margin_s, rank).
    *
    * `xs` and `ys` must carry disjoint vec_id spaces (the mined pair
    * (x,y) is identified by ids alone). Zero-code-norm rows drop on
    * both sides — the [[bruteTopK]] family contract.
    *
    * Scale shape: xs is the bounded probe set and broadcasts
    * quantized; pair volume is |X|·|Y| — linear in the corpus for a
    * fixed probe batch. The forward rank partitions by src (|Y|-sized
    * groups, rank cut by WindowGroupLimit) and the backward rank by
    * dst (|X|-sized groups, trivially bounded); only id/score triples
    * shuffle. At 100 TB, batch the X side (mine per probe shard) and
    * compose with [[assignCells]] to restrict Y to probed cells first —
    * the same exact-face→IVF ladder as [[bruteTopK]]→[[ivfTopK]].
    */
  def marginMine(xs: DataFrame, ys: DataFrame, k: Int,
      topPairs: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val xq = quantizeInt8(xs).select(col("vec_id").as("src_id"),
      col("q").as("q_x"))
      .where(intDot(col("q_x"), col("q_x")) > 0)
    val yq = quantizeInt8(ys).select(col("vec_id").as("dst_id"),
      col("q").as("q_y"))
      .where(intDot(col("q_y"), col("q_y")) > 0)
    val pairs = yq.join(broadcast(xq), col("src_id") =!= col("dst_id"))
      .select(col("src_id"), col("dst_id"),
        floor(lit(1000000.0) * intDot(col("q_x"), col("q_y")).cast("double") /
          sqrt(intDot(col("q_x"), col("q_x")).cast("double") *
            intDot(col("q_y"), col("q_y")).cast("double")))
          .cast("long").as("cos_s"))
    val fwdW = Window.partitionBy(col("src_id"))
      .orderBy(col("cos_s").desc, col("dst_id"))
    val bwdW = Window.partitionBy(col("dst_id"))
      .orderBy(col("cos_s").desc, col("src_id"))
    val fwd = pairs.withColumn("r", row_number().over(fwdW))
      .where(col("r") <= k)
      .groupBy("src_id").agg(sum(col("cos_s")).as("sum_fwd"))
    val bwd = pairs.withColumn("r", row_number().over(bwdW))
      .where(col("r") <= k)
      .groupBy("dst_id").agg(sum(col("cos_s")).as("sum_bwd"))
    val margined = pairs
      .join(fwd, "src_id")
      .join(bwd, "dst_id")
      .select(col("src_id"), col("dst_id"), col("cos_s"),
        (lit(2L * k) * col("cos_s") - col("sum_fwd") - col("sum_bwd"))
          .as("margin_s"))
    val outW = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_s").desc, col("dst_id"))
    margined.withColumn("rank", row_number().over(outW).cast("long"))
      .where(col("rank") <= topPairs)
  }

  /** Fixed-point squared L2 distance between two double-array columns:
    * Σ floor((x−y)²·1e6) as BIGINT — the same order-independent integer
    * contract as [[dotFp]], for the PQ codeword assignment.
    */
  private def l2Fp(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        floor(d * d * lit(1000000.0)).cast("long")
      }),
      lit(0L), (acc, x) => acc + x)

  /** PQ width contract, enforced in the plan: raises on the first row
    * whose embedding width `m` does not divide (the trailing dims % m
    * components would otherwise silently drop out of every subspace —
    * quietly weaker recall with no runtime signal). One size+mod per
    * row, codegen'd — negligible against the slice/transform work that
    * follows.
    */
  private def pqWidthChecked(vectors: DataFrame, m: Int): DataFrame =
    vectors.withColumn("embedding",
      when(size(col("embedding")) % m === 0, col("embedding"))
        .otherwise(raise_error(concat(
          lit("PQ width contract violated: embedding width "),
          size(col("embedding")).cast("string"),
          lit(s" is not divisible by m=$m")))))

  /** Product-quantization codebook: the embedding space is split into
    * `m` contiguous subspaces; each subspace's codewords are the
    * `nCodes` lowest-id vectors' subvectors (the engine's deterministic
    * seeding rule, as in IVF). Returns (sub, code_id, code_emb) —
    * m·nCodes rows, always broadcastable.
    *
    * Dimension contract: subspace width is size(embedding) / m, so `m`
    * must divide the embedding width — otherwise the trailing `dims % m`
    * components would silently fall out of every subspace (quietly
    * weaker recall with no signal). The width is data, not a parameter,
    * so the contract is enforced IN the plan: [[pqWidthChecked]] raises
    * on the first row whose width `m` does not divide.
    */
  def pqCodebook(rawVectors: DataFrame, m: Int, nCodes: Int): DataFrame = {
    val vectors = pqWidthChecked(rawVectors, m)
    val d = (size(col("embedding")) / m).cast("int")
    val subs = (0 until m).map(s =>
      struct(lit(s).as("sub"),
        transform(slice(col("embedding"), lit(s) * d + 1, d),
          x => x.cast("double")).as("code_emb")))
    vectors.orderBy("vec_id").limit(nCodes)
      .select(col("vec_id").as("code_id"), explode(array(subs: _*)).as("sc"))
      .select(col("sc.sub").as("sub"), col("code_id"), col("sc.code_emb").as("code_emb"))
  }

  /** PQ encoding: each vector's subvector is assigned its nearest
    * codeword by fixed-point L2 (ties → lowest code_id). Returns the
    * long form (vec_id, sub, code_id) — m rows per vector, the compact
    * at-rest representation (m small ints instead of the float array).
    * Codebook broadcasts; assignment is a min_by aggregation on
    * (vec_id, sub), so the |vectors|·m·nCodes scored rows collapse
    * map-side and the shuffle carries m rows per vector.
    */
  def pqEncode(rawVectors: DataFrame, codebook: DataFrame, m: Int): DataFrame = {
    val vectors = pqWidthChecked(rawVectors, m)
    val d = (size(col("embedding")) / m).cast("int")
    val subs = (0 until m).map(s =>
      struct(lit(s).as("sub"),
        slice(col("embedding"), lit(s) * d + 1, d).as("sv")))
    vectors.select(col("vec_id"), explode(array(subs: _*)).as("sc"))
      .select(col("vec_id"), col("sc.sub").as("sub"), col("sc.sv").as("sv"))
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("_dist", l2Fp(col("sv"), col("code_emb")))
      .groupBy("vec_id", "sub")
      .agg(min_by(col("code_id"), struct(col("_dist"), col("code_id"))).as("code_id"))
  }

  /** PQ ANN top-k by asymmetric distance computation (ADC): queries
    * precompute a lookup table of fixed-point dots against every
    * codeword; a candidate's approximate dot is the SUM of its m
    * codeword entries — the candidate's floats are never touched at
    * query time. Scoring is an equi-join of the (vec_id, sub, code_id)
    * codes against the broadcast LUT plus one partial-aggregated
    * groupBy; ranking shuffles (query, candidate, score) triples only.
    * Returns (query_id, vec_id, score_s, rank) — score_s is the exact
    * integer ADC dot (1e-6 fixed point), oracle-exact.
    */
  def pqTopK(rawQueries: DataFrame, candidates: DataFrame, k: Int,
      m: Int = 4, nCodes: Int = 16): DataFrame = {
    val cb = pqCodebook(candidates, m, nCodes)
    val codes = pqEncode(candidates, cb, m)
    val queries = pqWidthChecked(rawQueries, m)
    val d = (size(col("embedding")) / m).cast("int")
    val subs = (0 until m).map(s =>
      struct(lit(s).as("sub"),
        slice(col("embedding"), lit(s) * d + 1, d).as("qv")))
    val lut = queries.select(col("vec_id").as("query_id"), explode(array(subs: _*)).as("sc"))
      .select(col("query_id"), col("sc.sub").as("sub"), col("sc.qv").as("qv"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code_id"),
        dotFp(col("qv"), col("code_emb")).as("_dot"))
    val scored = codes.join(broadcast(lut), Seq("sub", "code_id"))
      .where(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("_dot")).as("score_s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_s").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** IVF-PQ ANN — the production composition (coarse inverted-file
    * partitioning × product-quantized codes): a query scans only its
    * `nProbe` nearest cells, and within them scores candidates by ADC
    * over the m-subspace codebook — so query cost is
    * |cell|·nProbe·m LUT lookups and the candidate floats are never
    * read at query time. At 100 TB the codes table (m small ints per
    * vector) is the only per-candidate state the search touches.
    * Cell restriction and code scoring are both equi-joins; the LUT
    * and centroids broadcast. Returns (query_id, vec_id, score_s,
    * rank) with the same integer ADC-dot contract as [[pqTopK]].
    */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, m: Int = 4, nCodes: Int = 16): DataFrame = {
    val cells = candidates.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cell_id"),
        transform(col("embedding"), x => x.cast("double")).as("cell_emb"))
      .select(col("cell_id"), col("cell_emb"), normFp(col("cell_emb")).as("cell_norm"))
    val assigned = assignCells(candidates, nCells)
    val cb = pqCodebook(candidates, m, nCodes)
    val codes = pqEncode(candidates, cb, m).join(assigned, Seq("vec_id"))
    // query side: top-nProbe cells by exact cosine (query sets are small
    // by construction — the window is bounded)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("cell_id"))
    val probed = queries
      .select(col("vec_id").as("query_id"), col("embedding"),
        normFp(col("embedding")).as("_norm"))
      .join(broadcast(cells))
      .withColumn("_cos", cosine(dotFp(col("embedding"), col("cell_emb")),
        col("_norm"), col("cell_norm")))
      .withColumn("_rank", row_number().over(probeW))
      .where(col("_rank") <= nProbe)
      .select(col("query_id"), col("cell_id"))
    val d = (size(col("embedding")) / m).cast("int")
    val subs = (0 until m).map(s =>
      struct(lit(s).as("sub"),
        slice(col("embedding"), lit(s) * d + 1, d).as("qv")))
    val lut = pqWidthChecked(queries, m)
      .select(col("vec_id").as("query_id"), explode(array(subs: _*)).as("sc"))
      .select(col("query_id"), col("sc.sub").as("sub"), col("sc.qv").as("qv"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code_id"),
        dotFp(col("qv"), col("code_emb")).as("_dot"))
    val scored = codes.join(broadcast(probed), Seq("cell_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code_id"))
      .where(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("_dot")).as("score_s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_s").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Binary (1-bit) sketch search — the extreme end of the compression
    * ladder (float32 → int8 → PQ codes → sign bits): every vector
    * collapses to `nPlanes` random-hyperplane sign bits in one BIGINT
    * (the [[lshBucket]] expression used as a SKETCH, not a bucket key),
    * and ranking is Hamming distance = bit_count(xor) — one ALU op per
    * comparison, no arrays touched. At 100 TB the whole sketch column
    * for a billion vectors is 8 GB. Recall is the lowest of the family
    * (bounded in SimilaritySpec); use as a pre-filter feeding an exact
    * or int8 rerank. Same join/shuffle shape as [[bruteTopK]]: queries
    * broadcast, only (query, candidate, distance) triples shuffle.
    * Returns (query_id, vec_id, hamming, rank), nearest first.
    */
  def hammingTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nPlanes: Int = 48): DataFrame = {
    // bound mirrors the LshBucket expression's own require (<= 62 so the
    // signature fits a signed long with no sign-bit plane) — checked here
    // too so a bad nPlanes fails with the operator's name, not deep in
    // expression construction
    require(nPlanes >= 1 && nPlanes <= 62, s"nPlanes must be in [1, 62], got $nPlanes")
    // zero vectors have sketch 0 and a defined (if meaningless) Hamming
    // distance — dropped anyway for family consistency: a degenerate
    // vector never surfaces as a match from any of the search paths
    val q = queries.where(normFp(col("embedding")) > 0)
      .select(col("vec_id").as("query_id"),
        lshBucket(col("embedding"), nPlanes).as("q_sig"))
    val c = candidates.where(normFp(col("embedding")) > 0)
      .select(col("vec_id"),
        lshBucket(col("embedding"), nPlanes).as("c_sig"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        bit_count(col("q_sig").bitwiseXOR(col("c_sig"))).cast("long").as("hamming"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Reciprocal-rank fusion: merge the rankings of several retrievers
    * (LSH, IVF, binary, quantized — any (query_id, vec_id, rank)
    * tables) into one consensus top-k by score Σ 1/(k0 + rank), the
    * standard RRF rule. Scores are fixed-point floor(1e6/(k0+rank)) —
    * integer sums, order-independent, oracle-exact. A candidate
    * surfaced by several retrievers outranks one surfaced high by a
    * single list — the robustness-to-one-bad-retriever property RRF is
    * used for. Input lists are top-k bounded, so the union and the
    * one partial-agged groupBy are tiny regardless of corpus size.
    * Returns (query_id, vec_id, rrf_s, n_lists, rank).
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rankings must be non-empty")
    val scored = rankings.map(_.select(col("query_id"), col("vec_id"),
        floor(lit(1000000.0) / (lit(k0.toDouble) + col("rank").cast("double")))
          .cast("long").as("s")))
      .reduce(_ unionAll _)
      .groupBy("query_id", "vec_id")
      .agg(sum(col("s")).as("rrf_s"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_s").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Embedding-space outlier detection — the data-quality face of
    * [[centroidStats]]: every vector is scored by its cosine to its own
    * group's centroid (the mean embedding, self included — the standard
    * convention) and flagged when it falls below `minCosine`. Mislabeled
    * or corrupted embeddings surface as the low-cosine tail; curation
    * drops or re-routes them before they poison an index or a
    * training mix. Returns (vec_id, group, cos_centroid, is_outlier).
    *
    * Scale shape: the centroid table is |groups|·dims fixed-point sums
    * (one partial-agged shuffle via centroidStats, then |groups| rows),
    * broadcast back for a map-side cosine — vectors are scanned twice
    * but never shuffled. Centroid components divide exact integer sums,
    * so scores are engine-exact and the flags oracle-checkable.
    */
  def centroidOutliers(vectors: DataFrame, groupCol: String = "label",
      minCosine: Double = 0.0): DataFrame = {
    val cent = centroidStats(vectors, groupCol)
      .select(col(groupCol), col("dim"),
        (col("sum_s").cast("double") /
          (lit(1000000.0) * col("n_vecs").cast("double"))).as("m"))
      .groupBy(groupCol)
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        e => e.getField("m")).as("c_emb"))
      .select(col(groupCol), col("c_emb"), normFp(col("c_emb")).as("c_norm"))
    vectors.select(col("vec_id"), col(groupCol), col("embedding"),
        normFp(col("embedding")).as("_norm"))
      .join(broadcast(cent), Seq(groupCol))
      .select(col("vec_id"), col(groupCol),
        // a zero (corrupt) vector has no defined cosine; [[cosine]]'s
        // −2 sentinel lands it below every minCosine — flagged, which
        // is exactly what outlier detection is FOR (an unguarded 0/0
        // would instead throw under ANSI mode and kill the query)
        cosine(dotFp(col("embedding"), col("c_emb")),
          col("_norm"), col("c_norm")).as("cos_centroid"))
      .withColumn("is_outlier", col("cos_centroid") < minCosine)
  }

  def nearDupPairs(vectors: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val v = vectors.select(col(blockCol).as("block"), col("vec_id"),
      col("embedding"), normFp(col("embedding")).as("norm"))
    v.as("a").join(v.as("b"),
        col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id_a"), col("b.vec_id").as("vec_id_b"),
        cosine(dotFp(col("a.embedding"), col("b.embedding")),
          col("a.norm"), col("b.norm")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Retrieval recall measurement — "measure, don't guess" for the ANN
    * ladder: per query, what fraction of the ground-truth top-k an
    * approximate retriever actually returned, as a fixed-point integer
    * (n_hit·1e6 div n_truth). Both inputs are (query_id, vec_id)
    * rankings; extra columns are ignored. The join is keyed
    * (query_id, vec_id) and both sides are k-bounded per query, so
    * this costs |queries|·k however large the corpus the retrievers
    * searched.
    */
  def annRecall(truth: DataFrame, retrieved: DataFrame): DataFrame =
    truth.select(col("query_id"), col("vec_id"))
      .join(retrieved.select(col("query_id"), col("vec_id"),
        lit(1L).as("hit")), Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_s",
        graft.ml.Training.floorDivP(col("n_hit") * lit(1000000L),
          col("n_truth")))

  /** Corpus diversity in one number: the mean pairwise signed-squared
    * cosine over a deterministic id-mod sample — the anisotropy /
    * mode-collapse monitor (a corpus whose embeddings crowd one
    * direction scores near `scale`; a diverse one near 0; a mixture of
    * antipodal clusters goes negative). The single-row companion to
    * [[kCentersCover]]'s per-center view and [[embeddingDrift]]'s
    * per-dim view.
    *
    * The sample is id-deterministic (vec_id ≡ 0 mod sampleMod) so the
    * number is reproducible and oracle-exact; pairwise over a sample,
    * never the corpus — mean-pairwise estimates converge at a few
    * thousand points, so sampleMod scales with the corpus to hold the
    * sample size roughly constant (the pair join is sample²-bounded BY
    * CONSTRUCTION, the designed bounded-BNLJ shape). The mean is a
    * pmod-subtract floor division: pairwise sims are legitimately
    * negative.
    */
  def pairwiseDiversity(vectors: DataFrame, sampleMod: Long = 11L,
      scale: Long = 1000000L): DataFrame = {
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    require(scale > 0, s"scale must be positive, got $scale")
    val q = quantizeInt8(vectors)
      .select(col("vec_id"), col("q"),
        graft.expressions.IntDot(col("q"), col("q")).as("n2"))
      .where(col("n2") > 0 && pmod(col("vec_id"), lit(sampleMod)) === 0)
    val d = graft.expressions.IntDot(col("a.q"), col("b.q"))
    q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(graft.ml.Training.floorDivP(d * abs(d) * scale,
        col("a.n2") * col("b.n2")).as("sim_s"))
      .groupBy()
      .agg(count(lit(1)).as("n_pairs"),
        graft.ml.Training.floorDivP(sum(col("sim_s")),
          greatest(count(lit(1)), lit(1L))).as("mean_sim_s"))
  }

  /** Mean-reciprocal-rank companion to [[annRecall]]: recall asks "how
    * much of the truth set did the retriever find"; MRR asks "how SOON
    * did it find any of it" — the metric that moves when a retriever
    * finds the right answers but buries them. Per query, the rank of
    * the FIRST retrieved item that belongs to the truth set and its
    * fixed-point reciprocal (`scale div rank`; 0-with-null-rank for
    * queries whose retrieval missed the truth set entirely — a miss is
    * a score, not an absent row).
    *
    * Scale shape: k-bounded join of two top-k tables on (query, item),
    * one query-keyed min — cost tracks the query workload × k, never
    * the corpus (the annRecall posture).
    */
  def mrr(truth: DataFrame, retrieved: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    truth.select(col("query_id"), col("vec_id"))
      .join(retrieved.select(col("query_id"), col("vec_id"), col("rank")),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(min(col("rank")).as("first_hit_rank"))
      .withColumn("rr_s",
        when(col("first_hit_rank").isNull, lit(0L))
          .otherwise(expr(s"$scale DIV first_hit_rank")))
  }

  /** Embedding-space drift between two corpus slices: per dimension,
    * the fixed-point mean of each slice and the absolute difference —
    * the embedding-side twin of `core.Profiler.histogramDrift` (a new
    * encoder version or a shifted crawl shows up as per-dim mean
    * displacement before any downstream metric moves). Means are
    * floor(Σ floor(x·1e6) / n) in exact long arithmetic (pmod-subtract
    * floor division — sums can be negative); an empty side reports
    * null means/deviation, not a crash.
    *
    * Scale shape: one union scan (side flag rides the rows), one
    * posexplode, ONE dims-keyed partial-aggregated groupBy — dims
    * groups on the wire regardless of corpus size.
    */
  def embeddingDrift(ref: DataFrame, cur: DataFrame): DataFrame = {
    val xs = floor(col("x").cast("double") * lit(1000000.0)).cast("long")
    val all = ref.select(lit(0L).as("side"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .unionAll(cur.select(lit(1L).as("side"),
        posexplode(col("embedding")).as(Seq("dim", "x"))))
      .select(col("side"), col("dim").cast("long").as("dim"), xs.as("xs"))
    def meanS(s: Column, n: Column): Column =
      when(n === 0L, lit(null).cast("long"))
        .otherwise(graft.ml.Training.floorDivP(s, n))
    all.groupBy("dim")
      .agg(sum(when(col("side") === 0L, col("xs")).otherwise(0L)).as("sr"),
        sum(when(col("side") === 0L, 1L).otherwise(0L)).as("nr"),
        sum(when(col("side") === 1L, col("xs")).otherwise(0L)).as("sc"),
        sum(when(col("side") === 1L, 1L).otherwise(0L)).as("nc"))
      .select(col("dim"),
        meanS(col("sr"), col("nr")).as("mean_ref_s"),
        meanS(col("sc"), col("nc")).as("mean_cur_s"),
        abs(meanS(col("sr"), col("nr")) - meanS(col("sc"), col("nc")))
          .as("dev_s"))
  }
}

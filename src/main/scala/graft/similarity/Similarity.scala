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

  /** Cosine from fixed-point parts — deterministic double. */
  def cosine(dot: Column, n1: Column, n2: Column): Column =
    dot.cast("double") / sqrt(n1.cast("double") * n2.cast("double"))

  /** Brute-force cosine top-k: for every query vector, the k most
    * similar non-identical vectors. Queries are broadcast; candidates
    * stream. Returns (query_id, vec_id, cosine, rank).
    */
  def bruteTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      normFp(col("embedding")).as("q_norm"))
    val c = candidates.select(col("vec_id"), col("embedding").as("c_emb"),
      normFp(col("embedding")).as("c_norm"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
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
    val seeds = candidates.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cell_id"),
        transform(col("embedding"), x => x.cast("double")).as("cell_emb"))
    var cells = seeds
      .select(col("cell_id"), col("cell_emb"), normFp(col("cell_emb")).as("cell_norm"))
    def withCellCos(df: DataFrame, idCol: String, cs: DataFrame): DataFrame =
      df.select(col(idCol), col("embedding"), normFp(col("embedding")).as("_norm"))
        .join(broadcast(cs))
        .withColumn("_cos", cosine(dotFp(col("embedding"), col("cell_emb")),
          col("_norm"), col("cell_norm")))
    // Rank-1 cell assignment as a max_by AGGREGATION, not a row_number
    // window: partial aggregation collapses the |vectors|·nCells scored
    // rows map-side to one row per vector, so the shuffle carries
    // |vectors| rows and nothing is sorted — the window form would
    // shuffle and sort all nCells copies of every vector. Tie-break
    // (highest cosine, then lowest cell_id) via lexicographic struct max.
    def rank1(cs: DataFrame): DataFrame =
      withCellCos(candidates, "vec_id", cs)
        .groupBy("vec_id")
        .agg(max_by(
          struct(col("embedding").as("c_emb"), col("_norm").as("c_norm"), col("cell_id")),
          struct(col("_cos").as("c"), (-col("cell_id")).as("nid"))).as("_a"))
        .select(col("vec_id"), col("_a.c_emb").as("c_emb"),
          col("_a.c_norm").as("c_norm"), col("_a.cell_id").as("cell_id"))
    // Lloyd passes: per-dimension FIXED-POINT sums (floor to 1e-6 as
    // BIGINT — order-independent, oracle-exact) divided by member count.
    // The explode shuffles (cell, dim) keys only — nCells·dims groups,
    // partial-aggregated map-side, regardless of candidate count.
    for (_ <- 0 until kmeansIters) {
      val refined = rank1(cells)
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
    val assigned = rank1(cells)
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
}

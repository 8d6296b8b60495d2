package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed power iteration for the TOP PRINCIPAL DIRECTION of an
  * embedding corpus — the eigenvector of the (uncentered) Gram matrix
  * G = Σ_i q_i·q_iᵀ: v ← normalize(G·v), which converges to the
  * dominant component at rate (λ₂/λ₁)ᵗ. The corpus-geometry summary a
  * pipeline wants before whitening, drift triage ("did the dominant
  * direction move between crawls"), or anisotropy checks (embedding
  * collapse shows up as one direction eating the spectrum). A fixed
  * iteration count keeps the run oracle-unrollable — the PageRank
  * trade; the rank-1 restriction is what keeps the distributed shape
  * trivial (full PCA would need an orthogonalization step per extra
  * component).
  *
  * G is NEVER materialized (dims² entries): each iteration computes
  *   s_i = ⟨q_i, v⟩          (map-only — v re-enters the plan as a
  *                            literal array, the GD-weights pattern)
  *   u_d = Σ_i q_i[d] · s_i  (ONE dims-keyed partial-aggregated
  *                            groupBy — dims groups on the wire
  *                            regardless of corpus size)
  * then v ← (u·scale) floorDiv max|u| on the driver (dims-bounded
  * collect, the classifier-head budget). All integer: inputs are the
  * int8 codes ([[graft.similarity.Similarity.quantizeInt8]]), v lives
  * in `scale` units, and the L∞ normalization is closed under longs —
  * floor division on possibly-negative u uses floor semantics in both
  * engines (Math.floorDiv here, `//` in the twin). Sign convention:
  * power iteration from the all-ones start is deterministic, so the
  * (inherently arbitrary) eigenvector sign is fixed by the data.
  *
  * Overflow headroom: |s_i| ≤ dims·127·scale, |u_d| ≤ n·127·|s|max —
  * at the default scale the SUM aggregation holds to n·dims ≲ 4e8
  * rows·dims; larger corpora lower `scale` to 1e3 (the fixed-point
  * family note) or hierarchically pre-aggregate u. The driver-side
  * L∞ rescale multiplies u by another factor of `scale`, which would
  * wrap a 64-bit product long before the sums do — so it runs in
  * BigInt (and the oracle twin in HUGEINT): exact for any u the
  * aggregation can produce, and the quotient is back within
  * [-scale, scale] so narrowing to Long afterwards is lossless.
  */
object Pca {

  /** @param vectors (vec_id, embedding: array<float>) — uniform width
    * @param dims    embedding width (every row must match: the int
    *                dot is null on mismatch and the iteration fails
    *                loudly rather than silently dropping rows)
    * @param iters   fixed power-iteration count
    * @return (dim, v_s): the dominant direction in scale units,
    *         L∞-normalized so max |v_s| = scale
    */
  def topComponent(vectors: DataFrame, dims: Int, iters: Int,
      scale: Long = 1000000L): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale > 0, s"scale must be positive, got $scale")
    val spark = vectors.sparkSession
    import spark.implicits._

    val q = graft.similarity.Similarity.quantizeInt8(vectors)
      .select(col("vec_id"), col("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var v = Array.fill(dims)(scale)
    for (_ <- 1 to iters) {
      val vLit = typedLit(v.toSeq)
      val rows = q
        .select(graft.expressions.IntDot(col("q"), vLit).as("s"),
          posexplode(col("q")).as(Seq("dim", "qv")))
        .groupBy(col("dim"))
        .agg(sum(col("qv").cast("long") * col("s")).as("u"),
          sum(when(col("s").isNull, 1L).otherwise(0L)).as("n_ragged"))
        .collect()
      // a width-mismatched row nulls its dot — fail loudly instead of
      // letting sum() silently drop it from the projection
      require(rows.forall(_.getLong(2) == 0L) && rows.length == dims,
        s"expected $dims uniform-width embeddings, got ${rows.length} dims" +
          s" with ${rows.map(_.getLong(2)).sum} ragged rows")
      val u = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
      val gmax = math.max(u.values.map(math.abs).max, 1L)
      // u·scale can exceed 2^63 even when the sums themselves fit
      // (|u| up to ~9.2e18/scale wraps at the default 1e6) — widen to
      // BigInt for the product, floor-divide (gmax > 0, so floor =
      // truncate-then-decrement on negative remainders), and narrow:
      // |result| ≤ scale by L∞ construction, so toLong is exact
      v = Array.tabulate(dims) { d =>
        val n = BigInt(u(d)) * scale
        val q0 = n / gmax
        (if (n % gmax < 0) q0 - 1 else q0).toLong
      }
    }
    q.unpersist()
    v.toSeq.zipWithIndex.map { case (s, d) => (d.toLong, s) }
      .toDF("dim", "v_s")
  }
}

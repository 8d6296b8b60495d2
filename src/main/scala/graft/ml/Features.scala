package graft.ml

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** The hashing trick: text → fixed-width hashed token-count vectors,
  * the featurizer that lets [[Training]]'s logistic head run over RAW
  * TEXT instead of precomputed embeddings — together they are the
  * fastText-style quality-filter fit (classify "keep/drop" from token
  * counts) that curation pipelines train on a labeled slice and then
  * apply corpus-wide.
  *
  * Each token's engine-portable rolling hash (the same
  * `TextAnalysis.tokenHashTable` hashes every dedup/retrieval operator
  * shares) is bucketed by `hash mod dims`; the feature value is the
  * bucket's occurrence count. No vocabulary is built or broadcast —
  * the defining property of the hashing trick and the reason it scales:
  * the feature space is fixed at `dims` regardless of corpus size, so
  * featurization is map-only after one (doc_id, bucket)-keyed count.
  *
  * Scale shape: explode-to-bucket → two partial-aggregated groupBys
  * keyed by (doc_id, dim) then doc_id — token strings never leave the
  * scan, only 8-byte hashes shuffle, and the dense array is assembled
  * per doc from its own ≤ dims nonzero entries (map lookup over a
  * dims-length sequence, O(dims·nnz) per row with dims small by
  * construction). Counts are exact integers, so the fixed-point
  * trainer's floor(x·1e6) representation is exact and the DuckDB
  * oracle replays training bit-identically.
  */
object Features {

  /** Dense hashed TERM-FREQUENCY vector per document:
    * `(vec_id, embedding: array<double>)` — vec_id = doc_id and the
    * [[Training]]/[[Inference]] input column names, so the featurizer
    * plugs straight into the existing heads. Buckets a document never
    * hits are exact 0.0.
    *
    * Values are c/n_tokens ∈ [0, 1], NOT raw counts: the fixed-point
    * trainer's hard-sigmoid linear region assumes unit-scale features
    * (the embedding contract); raw counts are ~1e2 too large and
    * saturate every margin into the clamp after one update. The
    * division is one IEEE double op on two exact integers, so the
    * oracle reproduces floor(x·1e6) bit-exactly.
    */
  def hashedFeatures(docs: DataFrame, dims: Int = 16): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    hashedFeaturesSparse(docs, dims)
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("dim"), col("c")))).as("m"),
        sum("c").as("n_toks"))
      .select(col("doc_id").as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)),
          d => coalesce(element_at(col("m"), d), lit(0L)).cast("double") /
            col("n_toks").cast("double"))
          .as("embedding"))
  }

  /** The nonzero entries `(doc_id, dim, c)` — the COO form, which is
    * also the oracle-checkable face (dense arrays are nested-typed and
    * banned from registered query outputs).
    */
  def hashedFeaturesSparse(docs: DataFrame, dims: Int = 16): DataFrame =
    TextAnalysis.tokenHashTable(docs)
      .select(col("doc_id"), explode(col("th")).as("h"))
      .groupBy(col("doc_id"),
        pmod(col("h"), lit(dims.toLong)).cast("int").as("dim"))
      .agg(count(lit(1)).as("c"))
}

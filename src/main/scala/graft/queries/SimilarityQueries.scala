package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Similarity-search queries over `embeddings(vec_id, embedding, label)`.
  *
  * The brute-force top-k ranking is fully hash-checked against DuckDB
  * (fixed-point dots → bit-identical cosine doubles → identical ranking
  * with vec_id tie-break). The LSH ANN variant is not ANSI-expressible
  * (engine-specific bucketing) → rows-only check + recall ScalaTest.
  */
object SimilarityQueries {

  private val dotSql =
    """CAST(list_sum(list_transform(list_zip(%s, %s),
      |  p -> CAST(floor(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1000000.0) AS BIGINT)))
      |  AS BIGINT)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // brute-force cosine top-5 for 8 query vectors over all candidates
    "q_sim_brute_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.bruteTopK(emb.where(col("vec_id") < 8), emb, k = 5)
    }),

    // multi-table hyperplane-LSH ANN (rows-only; recall vs brute force
    // is asserted in SimilaritySpec)
    "q_sim_lsh_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshTopK(emb.where(col("vec_id") < 8), emb, k = 5)
    }),

    // IVF ANN: nearest-centroid cells, nProbe-cell query scan
    // (rows-only; recall + exact-equivalence asserted in SimilaritySpec)
    "q_sim_ivf_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfTopK(emb.where(col("vec_id") < 8), emb, k = 5)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_sim_brute_topk" -> {
      val dotQC = dotSql.format("q.embedding", "c.embedding")
      val normQ = dotSql.format("q.embedding", "q.embedding")
      val normC = dotSql.format("c.embedding", "c.embedding")
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         |    CAST($dotQC AS DOUBLE) /
         |      sqrt(CAST($normQ AS DOUBLE) * CAST($normC AS DOUBLE)) AS cosine
         |  FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
         |  JOIN embeddings c ON q.vec_id != c.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5""".stripMargin
    }
  )
}

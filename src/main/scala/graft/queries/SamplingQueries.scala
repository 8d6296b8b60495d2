package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sampling.Sampling
import graft.text.TextAnalysis

/** Deterministic sampling / corpus-mixing queries over `documents`, with
  * DuckDB oracles re-deriving the same salted-hash buckets and window
  * quotas.
  */
object SamplingQueries {

  private val P = TextAnalysis.HashMod

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 30% deterministic Bernoulli sample keyed on doc_id (salt 3)
    "q_sample_hash" -> ((s, dir) =>
      Sampling.sampleByHash(Tables(s, dir, "documents"), "doc_id",
        fraction = 0.3, salt = 3)),

    // domain mixing: at most 8 docs per (source, lang), longest first
    "q_sample_cap" -> ((s, dir) =>
      Sampling.capPerGroup(Tables(s, dir, "documents"),
        Seq("source", "lang"), orderCol = "n_chars", tieCol = "doc_id", n = 8))
  )

  val oracles: Map[String, String] = Map(
    "q_sample_hash" -> {
      val a = TextAnalysis.hashA(3)
      val b = TextAnalysis.hashB(3)
      s"""SELECT * FROM documents
         |WHERE (((doc_id % $P) * $a + $b) % $P) % 1000 < 300""".stripMargin
    },

    "q_sample_cap" ->
      """SELECT * FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY source, lang
        |    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
        |  FROM documents)
        |WHERE rank <= 8""".stripMargin
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator family from SURVEY.md §2 is exposed as a
  * named query over the driver testdata (TESTDATA.md), with an equivalent
  * DuckDB oracle SQL where the semantics are ANSI-expressible. Queries are
  * grouped by module in graft.queries.*.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The gaps-and-islands coverage pipeline (SURVEY.md §7.2) — scan →
    * window (2 orderings) → islands → multi-level agg → broadcast join.
    */
  def entry(spark: SparkSession): DataFrame =
    CoverageQueries.coverages(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      WindowQueries.queries ++
      CoverageQueries.queries ++
      DomainQueries.queries ++
      DedupQueries.queries ++
      TextQueries.queries ++
      SimilarityQueries.queries ++
      MultimodalQueries.queries ++
      EventQueries.queries ++
      SamplingQueries.queries ++
      GraphQueries.queries ++
      BasketQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (window-UDAF defrag, iterative clustering, MinHash/SimHash) → the
    * driver records a weaker rows-only check; those are covered by
    * ScalaTest golden/property specs instead (SURVEY.md §5).
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
      WindowQueries.oracles ++
      CoverageQueries.oracles ++
      DomainQueries.oracles ++
      DedupQueries.oracles ++
      TextQueries.oracles ++
      SimilarityQueries.oracles ++
      MultimodalQueries.oracles ++
      EventQueries.oracles ++
      SamplingQueries.oracles ++
      GraphQueries.oracles ++
      BasketQueries.oracles
}

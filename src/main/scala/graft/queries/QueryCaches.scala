package graft.queries

import org.apache.spark.sql.SparkSession

/** Central release hook for the per-(session, dir) stage memos the query
  * modules keep (the in-session analogue of the reference's CACHE TABLE,
  * spark_utils.py:57-65). Harness mains (Verify/Bench) call this in
  * teardown so cached DataFrames never outlive the run: entries keyed by
  * a stopped session would otherwise pin their plans for the JVM
  * lifetime, and a parquet dir re-dumped under the same path in a live
  * session would be served stale from the memo.
  */
object QueryCaches {

  /** One declared warm-up unit: a named builder for a memoized shared
    * stage plus the stage names it consumes. The modules publish their
    * stages as steps and [[prebuildAll]] orders them by the DECLARED
    * graph (graft.core.Dag) instead of a hardcoded call chain — the
    * same deps-driven control surface the asset materializer
    * (graft.core.AssetDag) gives persisted tables, applied to the
    * in-session caches. Adding a stage means declaring its deps, not
    * finding the right line in a fragile ordered list; a cycle or a
    * misspelled dep fails loudly at warm-up, not as a mysteriously cold
    * first query.
    */
  final case class PrebuildStep(name: String, deps: Seq[String],
    run: (SparkSession, String) => Unit)

  /** Unpersist a memoized stage unless its owning SparkContext is
    * already stopped. The memos are keyed by session; if a harness or
    * spec stopped that session, the cached blocks died with its
    * BlockManager and `unpersist()` NPEs on the null driver endpoint —
    * there is nothing left to free, so dead-session entries are simply
    * dropped from the map.
    */
  def safeUnpersist(df: org.apache.spark.sql.DataFrame): Unit =
    try { if (!df.sparkSession.sparkContext.isStopped) df.unpersist() }
    catch { case scala.util.control.NonFatal(_) => () }

  def clearAll(): Unit = {
    DomainQueries.clearCache()
    CoverageQueries.clearCache()
    GraphQueries.clearCache()
    TextQueries.clearCache()
    DedupQueries.clearCache()
    SimilarityQueries.clearCache()
    BasketQueries.clearCache()
  }

  /** Every module's declared warm-up steps, in registration order. */
  def prebuildSteps: Seq[PrebuildStep] =
    DomainQueries.prebuildSteps ++
      CoverageQueries.prebuildSteps ++
      GraphQueries.prebuildSteps ++
      TextQueries.prebuildSteps ++
      DedupQueries.prebuildSteps ++
      SimilarityQueries.prebuildSteps ++
      BasketQueries.prebuildSteps

  /** Build + materialize every memoized shared stage (Bench warm-up):
    * the shared-chain construction cost is paid before timing starts,
    * so the first query over each chain measures its operator only.
    * Order comes from the steps' declared dependency graph — each
    * stage's noop write therefore pays only its OWN work, with its
    * upstream memos already hot.
    */
  def prebuildAll(s: SparkSession, dir: String): Unit = {
    val steps = prebuildSteps
    val byName = steps.map(st => st.name -> st).toMap
    graft.core.Dag.topoSort(steps.map(st => st.name -> st.deps))
      .foreach(n => byName(n).run(s, dir))
  }
}

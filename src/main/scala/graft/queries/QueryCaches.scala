package graft.queries

/** Central release hook for the per-(session, dir) stage memos the query
  * modules keep (the in-session analogue of the reference's CACHE TABLE,
  * spark_utils.py:57-65). Harness mains (Verify/Bench) call this in
  * teardown so cached DataFrames never outlive the run: entries keyed by
  * a stopped session would otherwise pin their plans for the JVM
  * lifetime, and a parquet dir re-dumped under the same path in a live
  * session would be served stale from the memo.
  */
object QueryCaches {
  def clearAll(): Unit = {
    DomainQueries.clearCache()
    CoverageQueries.clearCache()
  }
}

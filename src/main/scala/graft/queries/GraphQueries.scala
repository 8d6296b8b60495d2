package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.PageRank

/** Graph-analytics extension queries (graft.graph), oracle-checked.
  *
  * The fixture graph is the supplier co-supply graph: suppliers are
  * linked when they supply the same part (bounded m2m expansion per
  * part, both directions, deduplicated). PageRank runs a FIXED 2
  * iterations so the result is re-derivable as unrolled CTEs — the
  * same oracle-checkability trade as q_dedup_groups / q_sim_ivf_kmeans2;
  * unbounded convergence runs reuse the identical per-iteration plan.
  */
object GraphQueries {

  // The weighted co-supply edge list is the shared base of all four
  // graph queries (the m2m expansion + aggregate is the expensive
  // part); memoized per (session, dir, threshold) like the domain
  // chains. The unweighted pair list is exactly its key set.
  private val stageCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def coSupply(s: SparkSession, dir: String, minQty: Double): DataFrame =
    stageCache.computeIfAbsent((s, dir, s"cosupply_$minQty"), _ => {
      val li = Tables(s, dir, "lineitem").where(col("l_quantity") >= minQty)
      val sp = li.select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
      sp.as("a").join(sp.as("b"),
          col("a.pk") === col("b.pk") && col("a.sk") =!= col("b.sk"))
        .groupBy(col("a.sk").as("src"), col("b.sk").as("dst"))
        .agg(count(lit(1)).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Release memoized edge lists (see QueryCaches.clearAll). */
  def clearCache(): Unit = {
    stageCache.values().forEach(QueryCaches.safeUnpersist)
    stageCache.clear()
  }

  /** Materialize the shared edge bases off the bench clock. */
  def prebuild(s: SparkSession, dir: String): Unit =
    Seq(coSupply(s, dir, 40.0), coSupply(s, dir, 49.0))
      .foreach(_.write.format("noop").mode("overwrite").save())

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_graph_pagerank" -> ((s, dir) =>
      PageRank.run(coSupply(s, dir, 40.0).select(col("src"), col("dst")), iters = 2)),

    // production face: iterate until max per-node delta <= 1% of scale
    // (rows-only — convergence loops are not CTE-unrollable;
    // PageRankSpec proves face agreement). Round count is set by the
    // damping contraction (~log(scale·tol⁻¹)/log(d⁻¹) ≈ 28 at 1%), not
    // by graph size — the tolerance knob trades rounds for precision.
    "q_graph_pagerank_conv" -> ((s, dir) =>
      PageRank.runConverged(coSupply(s, dir, 40.0).select(col("src"), col("dst")),
        tolS = 10000L)),

    // weighted variant: co-supply multiplicity (shared-part count) as
    // the edge weight — contributions split proportionally
    "q_graph_pagerank_weighted" -> ((s, dir) =>
      PageRank.run(coSupply(s, dir, 40.0), iters = 2, weightCol = Some("w"))),

    // per-node triangle counts, degree-oriented wedge counting (the
    // thinner >=49 co-supply graph: triangle volume is cubic in
    // density, and the dense variant is a stress shape, not a corpus)
    "q_graph_triangles" -> ((s, dir) =>
      PageRank.triangleCounts(coSupply(s, dir, 49.0).select(col("src"), col("dst")))),

    // k-core peel, fixed 2 rounds (oracle-unrollable face; deep
    // tendril chains under-peel — the dedupGroups fixed-k trade)
    "q_graph_kcore" -> ((s, dir) =>
      graft.graph.KCore.peel(coSupply(s, dir, 49.0).select(col("src"), col("dst")),
        k = 3, rounds = 2)),

    // converged peel (rows-only; KCoreSpec proves face agreement and
    // the under-peel contrast)
    "q_graph_kcore_conv" -> ((s, dir) =>
      graft.graph.KCore.peelConverged(
        coSupply(s, dir, 49.0).select(col("src"), col("dst")), k = 3))
  )

  val oracles: Map[String, String] = Map(
    // 2-iteration unroll; all integer math (// is DuckDB floor
    // division, identical to Spark's `div` on positive longs), so the
    // compare is hash-exact with no float tolerance
    "q_graph_pagerank" ->
      """WITH sp AS (
        |  SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 40.0),
        |e AS (
        |  SELECT DISTINCT a.sk AS src, b.sk AS dst
        |  FROM sp a JOIN sp b ON a.pk = b.pk AND a.sk <> b.sk),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (
        |  SELECT e.dst AS node, sum(r0.r // deg.d) AS s1
        |  FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src
        |  GROUP BY 1),
        |r1 AS (
        |  SELECT n.node, 150000 + (85 * coalesce(c1.s1, 0)) // 100 AS r
        |  FROM nodes n LEFT JOIN c1 USING (node)),
        |c2 AS (
        |  SELECT e.dst AS node, sum(r1.r // deg.d) AS s2
        |  FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src
        |  GROUP BY 1),
        |r2 AS (
        |  SELECT n.node, 150000 + (85 * coalesce(c2.s2, 0)) // 100 AS r
        |  FROM nodes n LEFT JOIN c2 USING (node))
        |SELECT node, CAST(r AS BIGINT) AS rank_s FROM r2""".stripMargin,

    // weighted 2-iteration unroll: (r*w) // sw replaces r // deg
    "q_graph_pagerank_weighted" ->
      """WITH sp AS (
        |  SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 40.0),
        |e AS (
        |  SELECT a.sk AS src, b.sk AS dst, count(*) AS w
        |  FROM sp a JOIN sp b ON a.pk = b.pk AND a.sk <> b.sk
        |  GROUP BY 1, 2),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |deg AS (SELECT src, sum(w) AS sw FROM e GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (
        |  SELECT e.dst AS node, sum((r0.r * e.w) // deg.sw) AS s1
        |  FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src
        |  GROUP BY 1),
        |r1 AS (
        |  SELECT n.node, 150000 + (85 * coalesce(c1.s1, 0)) // 100 AS r
        |  FROM nodes n LEFT JOIN c1 USING (node)),
        |c2 AS (
        |  SELECT e.dst AS node, sum((r1.r * e.w) // deg.sw) AS s2
        |  FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src
        |  GROUP BY 1),
        |r2 AS (
        |  SELECT n.node, 150000 + (85 * coalesce(c2.s2, 0)) // 100 AS r
        |  FROM nodes n LEFT JOIN c2 USING (node))
        |SELECT node, CAST(r AS BIGINT) AS rank_s FROM r2""".stripMargin,

    // two unrolled peeling rounds: degrees over the full graph, then
    // over the subgraph induced by round-1 survivors
    "q_graph_kcore" ->
      """WITH sp AS (
        |  SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 49.0),
        |e AS (
        |  SELECT DISTINCT a.sk AS src, b.sk AS dst
        |  FROM sp a JOIN sp b ON a.pk = b.pk AND a.sk <> b.sk),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |a1 AS (SELECT src AS node FROM e GROUP BY 1 HAVING count(*) >= 3),
        |i2 AS (
        |  SELECT e.src, e.dst FROM e
        |  JOIN a1 x ON x.node = e.src
        |  JOIN a1 y ON y.node = e.dst),
        |a2 AS (SELECT src AS node FROM i2 GROUP BY 1 HAVING count(*) >= 3)
        |SELECT n.node, (a.node IS NOT NULL) AS in_core
        |FROM nodes n LEFT JOIN a2 a ON n.node = a.node""".stripMargin,

    // canonical x<y<z enumeration — each triangle contributes one tri
    // row and three corner credits, mirroring the oriented-wedge count
    "q_graph_triangles" ->
      """WITH sp AS (
        |  SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk
        |  FROM lineitem WHERE l_quantity >= 49.0),
        |canon AS (
        |  SELECT DISTINCT a.sk AS x, b.sk AS y
        |  FROM sp a JOIN sp b ON a.pk = b.pk AND a.sk < b.sk),
        |nodes AS (SELECT x AS node FROM canon UNION SELECT y FROM canon),
        |tri AS (
        |  SELECT c1.x AS a, c1.y AS b, c2.y AS c
        |  FROM canon c1
        |  JOIN canon c2 ON c2.x = c1.y
        |  JOIN canon c3 ON c3.x = c1.x AND c3.y = c2.y),
        |corners AS (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri),
        |cnt AS (SELECT node, count(*) AS n_triangles FROM corners GROUP BY 1)
        |SELECT n.node, CAST(coalesce(cnt.n_triangles, 0) AS BIGINT) AS n_triangles
        |FROM nodes n LEFT JOIN cnt USING (node)""".stripMargin
  )
}

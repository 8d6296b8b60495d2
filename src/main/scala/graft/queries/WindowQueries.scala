package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operator family (SURVEY.md §2.5 W1-W4) over testdata.
  *
  * Determinism: every window ORDER BY ends in the unique key
  * (l_orderkey, l_linenumber) / o_orderkey so row numbering is stable
  * across engines and partition counts.
  */
object WindowQueries {

  val queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(

    // W1: ROW_NUMBER per partition with two-level ordering — top-3
    // shipments per supplier (reference: coverages.py:47-48)
    "q_window_rownum" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      li.select(col("l_suppkey"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("linenumber"),
          row_number().over(w).cast("long").as("rn"))
        .where(col("rn") <= 3)
    }),

    // W2: running MAX over ROWS UNBOUNDED PRECEDING..1 PRECEDING —
    // count of new-high prices per supplier (reference: coverages.py:57-70)
    "q_window_runmax" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, -1)
      li.select(col("l_suppkey"), col("l_extendedprice"),
          max(col("l_extendedprice")).over(w).as("prev_max"))
        .where(col("prev_max").isNull || col("l_extendedprice") > col("prev_max"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_new_highs"))
    }),

    // W4+P5: whole-partition analytic MIN then filter-on-window-result —
    // earliest order(s) per customer (reference: downstream_clusters.py:132-148)
    "q_window_partition_min" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
      o.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          min(col("o_orderdate")).over(w).as("min_date"))
        .where(col("o_orderdate") === col("min_date"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    }),

    // W3-shaped running SUM with explicit ROWS frame and unique ordering
    "q_window_running_sum" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("linenumber"),
        sum(floor(col("l_quantity")).cast("long")).over(w).as("running_qty"))
    }),

    // LAG-style gap analysis (the reference left a LAG variant commented
    // at coverages.py:55-56); day gaps between consecutive shipments
    "q_window_lag_gap" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      li.select(col("l_suppkey"),
          datediff(col("l_shipdate"), lag(col("l_shipdate"), 1).over(w))
            .cast("long").as("gap_days"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("gap_days")).as("sum_gap_days"),
          max(col("gap_days")).as("max_gap_days"),
          count(col("gap_days")).as("n_gaps"))
    }),

    // Rank-family analytics in one pass: dense_rank, ntile, lead,
    // percent_rank, cume_dist share a single window spec → ONE shuffle
    // + one in-partition sort serves all five. The ordering ends in
    // the unique o_orderkey so there are no peer groups and every
    // function is engine-deterministic; the double-valued ratios
    // (percent_rank/cume_dist) are identical IEEE divisions on both
    // engines, floor-scaled per the oracle float pattern.
    "q_window_rank_family" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.select(col("o_orderpriority"), col("o_orderkey"),
          dense_rank().over(w).cast("long").as("drank"),
          ntile(8).over(w).cast("long").as("octile"),
          floor(coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1.0)) * 100.0)
            .cast("long").as("next_price_s"),
          floor(percent_rank().over(w) * 1000000.0).cast("long").as("pr_s"),
          floor(cume_dist().over(w) * 1000000.0).cast("long").as("cd_s"))
        .where(col("o_orderkey") % 5 === 0)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_window_rownum" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber, rn FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS BIGINT) AS rn
        |  FROM lineitem) WHERE rn <= 3""".stripMargin,

    "q_window_runmax" ->
      """SELECT l_suppkey, count(*) AS n_new_highs FROM (
        |  SELECT l_suppkey, l_extendedprice,
        |    max(l_extendedprice) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM lineitem)
        |WHERE prev_max IS NULL OR l_extendedprice > prev_max
        |GROUP BY l_suppkey""".stripMargin,

    "q_window_partition_min" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    min(o_orderdate) OVER (PARTITION BY o_custkey) AS min_date
        |  FROM orders) WHERE o_orderdate = min_date""".stripMargin,

    "q_window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
        |FROM lineitem""".stripMargin,

    "q_window_lag_gap" ->
      """SELECT l_suppkey, CAST(sum(gap_days) AS BIGINT) AS sum_gap_days, max(gap_days) AS max_gap_days,
        |  count(gap_days) AS n_gaps FROM (
        |  SELECT l_suppkey, CAST(date_diff('day',
        |    lag(l_shipdate, 1) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber),
        |    l_shipdate) AS BIGINT) AS gap_days
        |  FROM lineitem)
        |GROUP BY l_suppkey""".stripMargin,

    "q_window_rank_family" ->
      """WITH w AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(dense_rank() OVER win AS BIGINT) AS drank,
        |    CAST(ntile(8) OVER win AS BIGINT) AS octile,
        |    CAST(floor(coalesce(lead(o_totalprice, 1) OVER win, -1.0) * 100.0)
        |      AS BIGINT) AS next_price_s,
        |    CAST(floor(percent_rank() OVER win * 1000000.0) AS BIGINT) AS pr_s,
        |    CAST(floor(cume_dist() OVER win * 1000000.0) AS BIGINT) AS cd_s
        |  FROM orders
        |  WINDOW win AS (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey))
        |SELECT * FROM w WHERE o_orderkey % 5 = 0""".stripMargin
  )
}

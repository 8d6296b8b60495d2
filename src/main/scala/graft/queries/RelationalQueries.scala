package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ids.Ids

/** Relational operator families from SURVEY.md §2.2-§2.8 over the driver
  * testdata, each paired with a DuckDB oracle.
  *
  * Determinism conventions (so Spark and DuckDB hash-match):
  *  - double SUM/AVG use the fixed-point trick (Ids.fixedPointSum);
  *    MIN/MAX of doubles are exact order statistics and stay native;
  *  - integer-ish derived columns are cast to BIGINT on both sides;
  *  - "FIRST"-style aggregates are expressed as min_by/arg_min with a
  *    unique tie-break key.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  private def fps(c: Column, scale: Int = 2): Column = Ids.fixedPointSum(c, scale)

  /** ONE Scala value feeds the FD face and its oracle's UNION branches:
    * keys must determine attributes; low-cardinality columns must not.
    */
  private val fdCandidates: Seq[(String, String)] = Seq(
    "o_orderkey" -> "o_custkey",
    "o_orderkey" -> "o_orderstatus",
    "o_custkey" -> "o_orderstatus",
    "o_orderdate" -> "o_orderpriority")

  val queries: Map[String, Q] = Map(

    // A1+A2+A3: hash aggregate with min/max/sum/count per group
    "q_agg_sum_group" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        fps(col("l_quantity")).as("sum_qty"),
        fps(col("l_extendedprice")).as("sum_base_price"),
        fps(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        count(lit(1)).as("count_order"))
    }),

    // A4: MIN(date) per group (reference: publication_date.py:101-106)
    "q_agg_min_date" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy(col("o_custkey")).agg(min("o_orderdate").as("first_order_date"))
    }),

    // A5: MAX(string) collapse (reference: titles.py:26-28)
    "q_agg_max_string" -> ((s, dir) => {
      val p = Tables(s, dir, "part")
      p.groupBy(col("p_brand")).agg(max("p_name").as("max_name"),
        count(lit(1)).as("n_parts"))
    }),

    // A6: FIRST-style aggregate, deterministic via unique tie-break key
    // (reference: source_piece_statistics.py:27-28)
    "q_agg_first" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy(col("o_custkey")).agg(
        min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"),
        min_by(col("o_orderdate"), col("o_orderkey")).as("first_date"))
    }),

    // A7: COUNT(DISTINCT CASE WHEN ...) conditional distinct count
    // (reference: source_piece_statistics.py:30-48)
    "q_agg_conditional_distinct" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy(col("o_orderpriority")).agg(
        countDistinct(when(col("o_orderstatus") === "F", col("o_custkey"))).as("n_f_custs"),
        countDistinct(when(col("o_totalprice") > 100000.0, col("o_custkey"))).as("n_big_custs"),
        count(lit(1)).as("n_orders"))
    }),

    // A8: collect_list into array (reference:
    // chinese_label_propagation.py:43), made order-deterministic by
    // sorting; serialized to string so the oracle can reproduce it
    "q_agg_collect_sorted" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      c.groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("c_name")))).as("names"),
          count(lit(1)).as("n_customers"))
    }),

    // A11: global distinct count
    "q_agg_distinct_count" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
    }),

    // A12: GROUP BY over a date function (reference: publication_date.py:74-79)
    "q_agg_group_year" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(count(lit(1)).as("n_orders"), fps(col("o_totalprice")).as("sum_price"))
    }),

    // J1: inner equi-join USING, aggregated
    "q_join_inner" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
      li.join(o, Seq("l_orderkey"), "inner")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), fps(col("l_extendedprice")).as("sum_price"))
    }),

    // J2: left outer join, null-producing side aggregated with coalesce
    "q_join_left" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // J3: anti-join (reference: reception.py:21-25 uses right join +
    // IS NULL; idiomatic Spark is left_anti — parity-tested in AntiJoinSpec)
    "q_join_anti" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").where(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // left_semi (EXISTS) — complement of J3
    "q_join_semi" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
    }),

    // J4: composite multi-column equi-join (reference: orig_textreuses.py:61-62)
    "q_join_composite" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val pairs = li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("n_uses"))
        .where(col("n_uses") >= 2)
      li.join(pairs, Seq("l_partkey", "l_suppkey"), "inner")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"), fps(col("l_quantity")).as("sum_qty"))
    }),

    // J5: join with extra constant predicate (reference: actors_and_authors.py:47-51)
    "q_join_mixed_pred" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey") && li("l_returnflag") === "R", "left")
        .groupBy(col("o_orderstatus"))
        .agg(count(col("l_orderkey")).as("n_r_lines"), count(lit(1)).as("n_rows"))
    }),

    // J6+J8: broadcast-hinted N-way star join (reference: coverages.py:22,
    // source_piece_statistics.py:49-59) — dims broadcast, fact shuffles once
    "q_join_star" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(fps(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // J9: self-join via two aliases (reference: raw_textreuses.py:202-203)
    "q_join_self" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val a = li.as("a")
      val b = li.as("b")
      a.join(b, col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_linenumber") < col("b.l_linenumber"))
        .groupBy(col("a.l_returnflag").as("flag_a"), col("b.l_returnflag").as("flag_b"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // incremental aggregate maintenance (core.Incremental): three
    // per-batch states built independently, merged in a batch order the
    // single-pass oracle never sees — the merged read face must equal
    // the full groupBy EXACTLY (fixed-point sums make the equality
    // bit-true; double sums would drift with association order)
    "q_agg_incremental" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_quantity").as("v"),
          pmod(col("l_orderkey"), lit(3)).as("b"))
      val states = (0 to 2).map(i =>
        graft.core.Incremental.aggState(li.where(col("b") === i), Seq("flag"), "v"))
      graft.core.Incremental.readAggregates(
        graft.core.Incremental.mergeStates(
          Seq(states(2), states(0), states(1)), Seq("flag")),
        Seq("flag"))
    }),

    // Bloom-pruned join (core.RuntimeFilter): the probe side (lineitem)
    // is cut by a 256-word Bloom of the build side's keys BEFORE its
    // shuffle — the cross-materialization runtime-filter shape. The
    // result is EXACTLY the plain join (no false negatives; false
    // positives die in the real join), so the oracle is the unpruned
    // ANSI join — the pruning is invisible to correctness, by design.
    "q_join_bloom_pruned" -> ((s, dir) => {
      val build = Tables(s, dir, "supplier").where(col("s_nationkey") === 3)
        .select(col("s_suppkey"), col("s_acctbal"))
      val probe = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
      graft.core.RuntimeFilter.bloomPrunedJoin(probe, build,
          "l_suppkey", "s_suppkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"),
          col("s_acctbal"))
    }),

    // J7: many-to-many key expansion (reference: reception.py:56-60)
    "q_join_m2m" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem").where(col("l_quantity") >= 45.0)
      val a = li.select(col("l_partkey"), col("l_orderkey").as("o1"))
      val b = li.select(col("l_partkey"), col("l_orderkey").as("o2"))
      a.join(b, Seq("l_partkey"))
        .where(col("o1") < col("o2"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // U1: UNION (distinct) of two projections (reference: raw_textreuses.py:150-170)
    "q_union_distinct" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val c = Tables(s, dir, "customer").select(col("c_custkey").as("custkey"))
      o.union(c).distinct()
    }),

    // U3/U4: INTERSECT / EXCEPT — the remaining ANSI set operations
    // (Spark plans both as aggregate + left-semi/anti join, the same
    // shuffle shape as the union dedup): customers with a finished
    // order vs customers with any high-value order
    "q_set_intersect" -> ((s, dir) => {
      val f = Tables(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val hi = Tables(s, dir, "orders").where(col("o_totalprice") > 150000.0)
        .select(col("o_custkey").as("custkey"))
      f.intersect(hi)
    }),

    "q_set_except" -> ((s, dir) => {
      val f = Tables(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val hi = Tables(s, dir, "orders").where(col("o_totalprice") > 150000.0)
        .select(col("o_custkey").as("custkey"))
      f.except(hi)
    }),

    // U2: UNION ALL then re-aggregate (reference: ids_and_mappings.py:28-35)
    "q_union_all" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_custkey").as("custkey"), lit("order").as("src"))
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), lit("customer").as("src"))
      o.unionAll(c).groupBy(col("src")).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("custkey")).as("n_keys"))
    }),

    // O2: ORDER BY ... LIMIT top-k with unique tie-break (reference:
    // publication_date.py:74-79)
    "q_topk" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // S10+S11+O1: dictionary encoding — global sort then contiguous ids
    "q_dict_encode" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      Ids.dictionary(c, "c_mktsegment", "segment_id")
    }),

    // §2.8 string scalar functions (split/locate/substr/length/concat/case)
    "q_scalar_string" -> ((s, dir) => {
      val p = Tables(s, dir, "part")
      p.select(
          split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
          expr("locate(' ', p_type)").cast("long").as("first_space"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit("#"), upper(substring(col("p_type"), 1, 3))).as("brand_tag"),
          when(col("p_size") >= 25, lit("L")).when(col("p_size") >= 10, lit("M"))
            .otherwise(lit("S")).as("size_class"))
        .groupBy(col("type_head"), col("size_class"))
        .agg(count(lit(1)).as("n"), max("brand_tag").as("max_tag"),
          sum("name_len").as("sum_name_len"), max("first_space").as("max_first_space"))
    }),

    // §2.8 date scalar functions
    "q_scalar_date" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.select(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"))
        .groupBy(col("y"), col("m"))
        .agg(count(lit(1)).as("n_orders"), max(col("d")).as("max_day"))
    }),

    // Full outer join — both null-producing sides exercised: the
    // customer side is filtered (acctbal threshold) so some order
    // groups lose their match, and order-less customers survive from
    // the right. One shuffle on the key; same scale class as J2.
    "q_join_full" -> ((s, dir) => {
      val oa = Tables(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      val cs = Tables(s, dir, "customer")
        .where(col("c_acctbal") > 5000.0)
        .select(col("c_custkey"), col("c_mktsegment"))
      oa.join(cs, oa("o_custkey") === cs("c_custkey"), "full")
        .select(
          coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          when(col("c_custkey").isNull, lit("orders_only"))
            .when(col("o_custkey").isNull, lit("customer_only"))
            .otherwise(lit("both")).as("side"))
    }),

    // incremental snapshot merge (MERGE INTO / upsert face): batch
    // doc_ids >= 200 merge into the < 400 snapshot — doc 200-299
    // arrive modified (update), 300-399 identical (unchanged), >= 400
    // new (insert), < 200 snapshot-only (carry). One full-outer join,
    // presence by marker literals (core.Merge)
    "q_merge_snapshot" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val snapshot = docs.where(col("doc_id") < 400)
        .select(col("doc_id"), col("text"), col("lang"))
      val batch = docs.where(col("doc_id") >= 200)
        .select(col("doc_id"),
          when(col("doc_id") < 300, concat(lit("v2 "), col("text")))
            .otherwise(col("text")).as("text"),
          col("lang"))
      graft.core.Merge.mergeSnapshot(snapshot, batch, "doc_id", Seq("text", "lang"))
    }),

    // EXCEPT ALL — multiset difference (exceptAll keeps per-row
    // multiplicity; plain except would silently dedup). Spark plans
    // this as a count-tagged aggregate + generate, no cartesian.
    "q_set_except" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val r = li.where(col("l_returnflag") === "R").select(col("l_partkey"))
      val a = li.where(col("l_returnflag") === "A").select(col("l_partkey"))
      r.exceptAll(a).groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_excess"))
    }),

    // INTERSECT ALL — multiset intersection, same engine shape
    "q_set_intersect" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val r = li.where(col("l_returnflag") === "R").select(col("l_partkey"))
      val a = li.where(col("l_returnflag") === "A").select(col("l_partkey"))
      r.intersectAll(a).groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_common"))
    }),

    // ROLLUP hierarchy totals (year → status → grand total) with
    // grouping_id disambiguating real NULL keys from rollup NULLs.
    // One shuffle: Spark expands the grouping sets map-side then
    // hash-aggregates — no per-level rescan of the fact table.
    "q_agg_rollup" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.rollup(year(col("o_orderdate")).cast("long").as("order_year"),
          col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          fps(col("o_totalprice")).as("sum_price"),
          grouping_id().cast("long").as("gid"))
    }),

    // CUBE — all 2^k marginal totals in one pass (same expand shape)
    "q_agg_cube" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_lines"),
          fps(col("l_quantity")).as("sum_qty"),
          grouping_id().cast("long").as("gid"))
    }),

    // Explicit GROUPING SETS — two independent 1-d marginals + grand
    // total without the full cube
    "q_agg_grouping_sets" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          fps(col("o_totalprice")).as("sum_price"),
          grouping_id().cast("long").as("gid"))
    }),

    // PIVOT — long→wide with a pinned value list (the scalable form:
    // an unpinned pivot needs a driver-side distinct to discover
    // columns). Absent cells filled 0 to match the oracle's FILTER
    // counts. One hash aggregate; output width is the pinned list.
    "q_pivot_langs" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val langs = Seq("de", "en", "es", "fr", "zh")
      d.groupBy(col("source"))
        .pivot("lang", langs)
        .agg(count(lit(1)))
        .na.fill(0L, langs)
    }),

    // boolean/conditional aggregate family: count_if + bool_and/bool_or
    // (ANSI EVERY/ANY) — one pass, partial-aggregated like any hash agg
    "q_agg_bool" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy(col("o_orderpriority")).agg(
        count_if(col("o_orderstatus") === "F").as("n_finished"),
        bool_and(col("o_totalprice") > 900.0).as("all_above_900"),
        bool_or(col("o_totalprice") > 400000.0).as("any_above_400k"),
        count(lit(1)).as("n_orders"))
    }),

    // defensive scalar arithmetic: try_divide / nullif — error-safe
    // math that yields NULL instead of failing the job on a bad row
    // (the posture batch curation needs: one pathological row must not
    // kill a 100 TB pass)
    "q_scalar_try" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.select(col("l_orderkey"),
          try_divide(col("l_extendedprice"), col("l_discount")).as("price_per_disc"),
          try_divide(col("l_quantity"), col("l_quantity") - col("l_quantity")).as("div_zero"))
        .groupBy((col("l_orderkey") % 7).as("bucket"))
        .agg(count(col("price_per_disc")).as("n_divisible"),
          count(col("div_zero")).as("n_div_zero_nonnull"),
          count(lit(1)).as("n_rows"))
    }),

    // Spark 4 Dataset.transpose — rows↔columns with the index column's
    // values becoming column names (the long→wide dual of unpivot,
    // bounded index domain like pivot's pinned list)
    "q_transpose_langs" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      d.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .transpose(col("lang"))
    }),

    // S10/S11 production face: extend a dictionary with a new drop —
    // old ids stable, new values appended densely after the max
    "q_dict_extend" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val existing = Ids.dictionary(d.where(col("lang") < "es"), "lang", "lang_id")
      Ids.extendDictionary(existing, d, "lang", "lang_id")
    }),

    // One-pass column profiler (core.Profiler): all per-column stats
    // from a single scan + single aggregate, exploded to long form
    "q_profile_documents" -> ((s, dir) =>
      graft.core.Profiler.profile(Tables(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))),

    // Declarative data-quality report (core.Quality): row rules (two
    // designed to fail), key uniqueness (one designed to fail — m:1
    // lineitem keys), referential integrity — one (check, counts,
    // passed) row per declared expectation
    "q_quality_report" -> ((s, dir) => {
      val q = graft.core.Quality
      val li = Tables(s, dir, "lineitem")
      val ord = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      q.report(Seq(
        q.checkRules(li, Seq(
          "lineitem.quantity_positive" -> (col("l_quantity") > 0),
          "lineitem.quantity_le_30" -> (col("l_quantity") <= 30),
          "lineitem.discount_range" ->
            (col("l_discount") >= 0.0 && col("l_discount") <= 0.3),
          "lineitem.shipdate_not_null" -> col("l_shipdate").isNotNull)),
        q.checkUnique(ord, Seq("o_orderkey"), "orders.pk_unique"),
        q.checkUnique(li, Seq("l_orderkey"), "lineitem.orderkey_unique"),
        q.checkReferential(li, Seq("l_orderkey"), ord, Seq("o_orderkey"),
          "lineitem.fk_orders"),
        q.checkReferential(ord, Seq("o_custkey"), cust, Seq("c_custkey"),
          "orders.fk_customer")))
    }),

    // k-anonymity release gate: every (lang, source) equivalence class
    // with its size; classes under k=5 are re-identifiable and flag
    "q_quality_k_anonymity" -> ((s, dir) =>
      graft.core.Quality.kAnonymity(Tables(s, dir, "documents"),
        Seq("lang", "source"), k = 5)),

    // l-diversity release gate: (source, 256-char length bucket)
    // classes scored by distinct-language diversity — a class whose
    // documents all share one language leaks it (homogeneity attack)
    // even when the class passes k-anonymity
    "q_quality_l_diversity" -> ((s, dir) =>
      graft.core.Quality.lDiversity(
        Tables(s, dir, "documents")
          .withColumn("len_bucket", expr("n_chars DIV 256")),
        Seq("source", "len_bucket"), "lang", l = 3)),

    // t-closeness release gate, completing the k-anonymity /
    // l-diversity triad: (source, length-bucket) classes scored by the
    // total-variation distance between their language distribution and
    // the corpus-wide one — a class that is 98% one language leaks it
    // by skew even with 3 distinct values present. t = 0.2 in 1e6
    // fixed-point units; all integer, hash-exact.
    "q_quality_t_closeness" -> ((s, dir) =>
      graft.core.Quality.tCloseness(
        Tables(s, dir, "documents")
          .withColumn("len_bucket", expr("n_chars DIV 256")),
        Seq("source", "len_bucket"), "lang", tS = 200000L)),

    // Equi-width histogram of document lengths: 16 exact integer bins
    // over the observed [lo, hi] range (core.Profiler.histogram)
    "q_profile_histogram" -> ((s, dir) =>
      graft.core.Profiler.histogram(Tables(s, dir, "documents"),
        "n_chars", bins = 16)),

    // snapshot drift monitor: even vs odd doc_ids as two pseudo
    // snapshots, length distributions compared on shared bin edges;
    // sum(dev_s)/2e6 is the total-variation drift alarm
    "q_profile_drift" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.core.Profiler.histogramDrift(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1),
        "n_chars", bins = 16)
    }),

    // Join-key skew diagnostic (core.Skew.diagnoseKey): the 20 heaviest
    // event users with exact counts + fixed-point corpus fraction — the
    // measurement behind the salt-or-not decision
    "q_profile_skew" -> ((s, dir) =>
      graft.core.Skew.diagnoseKey(Tables(s, dir, "events"), "user_id", topN = 20)),

    // exact Pearson correlation matrix over lineitem's money columns
    // (integer cents via the fixed-point floor(x·100) idiom): one scan,
    // one aggregate, decimal sufficient statistics
    "q_profile_corr" -> ((s, dir) =>
      graft.core.Profiler.correlationMatrix(
        Tables(s, dir, "lineitem").select(
          floor(col("l_quantity") * 100.0).cast("long").as("qty_c"),
          floor(col("l_extendedprice") * 100.0).cast("long").as("price_c"),
          floor(col("l_discount") * 100.0).cast("long").as("disc_c")),
        Seq("qty_c", "price_c", "disc_c"))),

    // snapshot reconciliation by order-independent bucket digests: the
    // "which buckets differ" work-list between a snapshot and a
    // perturbed twin (every 971st key's payload bumped, keys ≡5 mod 2003
    // deleted — sparse, so MOST buckets match and the cut is visible) — row-level compare needed only where matches=false
    "q_merge_digest_diff" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100.0).cast("long").as("v"))
      val changed = o
        .withColumn("v",
          when(pmod(col("k"), lit(971L)) === 0L, col("v") + 1L).otherwise(col("v")))
        .where(pmod(col("k"), lit(2003L)) =!= 5L)
      graft.core.Merge.digestDiff(
        graft.core.Merge.bucketDigests(o, "k", "v", nBuckets = 64),
        graft.core.Merge.bucketDigests(changed, "k", "v", nBuckets = 64))
    }),

    // the digest-guided reconciliation PIPELINE: digest diff → dirty
    // buckets only pay the row-level mergeSnapshot → clean buckets are
    // declared unchanged wholesale. The composed per-change counts must
    // equal a full-table compare (the oracle) — i.e. the >99% cut is
    // EXACTLY lossless, not approximately; a digest collision that
    // falsely cleared a dirty bucket would break the hash here
    "q_pipeline_reconcile" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100.0).cast("long").as("v"))
      val changed = o
        .withColumn("v",
          when(pmod(col("k"), lit(971L)) === 0L, col("v") + 1L).otherwise(col("v")))
        .where(pmod(col("k"), lit(2003L)) =!= 5L)
      val dirty = graft.core.Merge.digestDiff(
          graft.core.Merge.bucketDigests(o, "k", "v", nBuckets = 64),
          graft.core.Merge.bucketDigests(changed, "k", "v", nBuckets = 64))
        .where(!col("matches")).select("bucket")
      def withB(df: DataFrame) =
        df.withColumn("bucket", pmod(col("k"), lit(64L)))
      val rowLevel = graft.core.Merge.mergeSnapshot(
          withB(o).join(dirty, Seq("bucket"), "left_semi").select("k", "v"),
          withB(changed).join(dirty, Seq("bucket"), "left_semi").select("k", "v"),
          "k", Seq("v"))
        .groupBy("change").agg(count(lit(1)).as("n"))
      val clean = withB(o).join(dirty, Seq("bucket"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("unchanged").as("change"), col("n"))
      rowLevel.unionByName(clean)
        .groupBy("change").agg(sum(col("n")).as("n"))
    }),

    // robust per-group statistics: exact doubled median (two order
    // statistics — integer for both parities), 4x MAD by the same trick
    // on deviations, rank-trimmed 10-90% mean in fixed-point. The
    // outlier-proof profile face; all integer, hash-exact
    "q_profile_robust" -> ((s, dir) =>
      graft.core.Profiler.robustStats(
        Tables(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"),
            floor(col("l_extendedprice") * 100.0).cast("long").as("cents")),
        "flag", "cents")),

    // targeted functional-dependency check: keys must determine their
    // attributes (holds), low-cardinality columns must NOT (violation
    // counts say how far off a claimed rule is) — the schema-discovery
    // face over the orders table
    "q_profile_fd" -> ((s, dir) =>
      graft.core.Profiler.functionalDependencies(
        Tables(s, dir, "orders"), fdCandidates)),

    // Gini concentration of per-user event mass: the one-number skew
    // summary (0 even → 1 concentrated), exact integers over the
    // rank-ordered group masses
    "q_profile_gini" -> ((s, dir) =>
      graft.core.Profiler.giniOfGroups(Tables.events(s, dir), "user_id")),

    // Shannon entropy of the language column, 1e-6 nats: the diversity
    // dual (exp(H) = effective language count), per-term floored logs
    // on exact-integer ratios
    "q_profile_entropy" -> ((s, dir) =>
      graft.core.Profiler.entropyOf(Tables(s, dir, "documents"), "lang")),

    // Poisson-bootstrap 95% CI for the mean order total: 40
    // deterministic hash-weighted resamples, rank-selected interval —
    // the is-that-move-noise companion to the point profiler
    "q_profile_bootstrap_ci" -> ((s, dir) =>
      graft.sampling.Sampling.bootstrapMeanCi(
        Tables(s, dir, "orders").select(col("o_orderkey"),
          floor(col("o_totalprice") * 100.0).cast("long").as("cents")),
        "o_orderkey", "cents")),

    // Benford first-digit audit of order totals: per-digit observed
    // counts vs the log10(1+1/d) expectation, deviation in 1e-6 mass
    // units — the fabricated-data tripwire
    "q_profile_benford" -> ((s, dir) =>
      graft.core.Profiler.benford(Tables(s, dir, "orders"), "o_totalprice")),

    // Correlated LATERAL subquery: top-2 suppliers per nation by
    // account balance — the SQL-surface face of per-group top-k
    // (Catalyst decorrelates it into the same window-rank plan)
    "q_join_lateral" -> ((s, dir) => {
      // view names are uniquely prefixed: registering bare "nation" /
      // "supplier" would mutate shared session catalog state as a side
      // effect of BUILDING this query and could clobber views another
      // query registered in the same session
      Tables(s, dir, "nation").createOrReplaceTempView("graft_lateral_nation")
      Tables(s, dir, "supplier").createOrReplaceTempView("graft_lateral_supplier")
      s.sql("""
        SELECT n.n_name, t.s_name, t.s_acctbal
        FROM graft_lateral_nation n,
        LATERAL (
          SELECT s_name, s_acctbal FROM graft_lateral_supplier s
          WHERE s.s_nationkey = n.n_nationkey
          ORDER BY s_acctbal DESC, s_name LIMIT 2
        ) t
      """)
    }),

    // Z-order layout key (graft.layout.ZOrder): the Morton bit
    // interleave is a pure shift/and/or scalar expression —
    // oracle-checked bit for bit against the same formula in SQL
    "q_layout_zorder" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").where(col("o_orderkey") % 7 === 0)
      val x = col("o_custkey").bitwiseAND(lit(1023L))
      val y = col("o_orderkey").bitwiseAND(lit(1023L))
      o.select(col("o_orderkey"), x.as("x"), y.as("y"),
        graft.layout.ZOrder.zValue(Seq(x, y), bits = 10).as("z"))
    }),

    // UNPIVOT (melt) — wide→long without N self-scans: one pass,
    // each row expands to (metric, value) pairs map-side
    "q_unpivot_metrics" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "v")
        .groupBy(col("metric"))
        .agg(fps(col("v")).as("sum_v"), count(lit(1)).as("n_rows"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_agg_sum_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(floor(l_quantity * 100.0) AS BIGINT)) / 100.0 AS sum_qty,
        |  sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) / 100.0 AS sum_base_price,
        |  sum(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 100.0) AS BIGINT)) / 100.0 AS sum_disc_price,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_min_date" ->
      "SELECT o_custkey, min(o_orderdate) AS first_order_date FROM orders GROUP BY o_custkey",

    "q_agg_max_string" ->
      "SELECT p_brand, max(p_name) AS max_name, count(*) AS n_parts FROM part GROUP BY p_brand",

    "q_agg_first" ->
      """SELECT o_custkey, arg_min(o_orderstatus, o_orderkey) AS first_status,
        |  arg_min(o_orderdate, o_orderkey) AS first_date
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "q_agg_conditional_distinct" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS n_f_custs,
        |  count(DISTINCT CASE WHEN o_totalprice > 100000.0 THEN o_custkey END) AS n_big_custs,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_agg_collect_sorted" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names,
        |  count(*) AS n_customers
        |FROM customer GROUP BY c_nationkey""".stripMargin,

    "q_agg_distinct_count" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem""".stripMargin,

    "q_agg_group_year" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, count(*) AS n_orders,
        |  sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) / 100.0 AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q_join_left" ->
      """SELECT coalesce(c_mktsegment, 'NONE') AS segment, count(*) AS n_orders
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,

    "q_join_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "q_join_composite" ->
      """WITH pairs AS (
        |  SELECT l_partkey, l_suppkey, count(*) AS n_uses
        |  FROM lineitem GROUP BY l_partkey, l_suppkey HAVING count(*) >= 2)
        |SELECT l_returnflag, count(*) AS n_lines,
        |  sum(CAST(floor(l_quantity * 100.0) AS BIGINT)) / 100.0 AS sum_qty
        |FROM lineitem JOIN pairs USING (l_partkey, l_suppkey)
        |GROUP BY l_returnflag""".stripMargin,

    "q_join_mixed_pred" ->
      """SELECT o_orderstatus, count(l_orderkey) AS n_r_lines, count(*) AS n_rows
        |FROM orders LEFT JOIN lineitem
        |  ON o_orderkey = l_orderkey AND l_returnflag = 'R'
        |GROUP BY o_orderstatus""".stripMargin,

    "q_join_star" ->
      """SELECT r_name, n_name,
        |  sum(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 100.0) AS BIGINT)) / 100.0 AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q_join_self" ->
      """SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b, count(*) AS n_pairs
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
        |GROUP BY 1, 2""".stripMargin,

    // the single-pass aggregate the batch-merged state must equal
    // bit-for-bit; avg is the subtract-remainder exact division
    "q_agg_incremental" ->
      """WITH c AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(floor(l_quantity * 100.0) AS BIGINT) AS cents
        |  FROM lineitem),
        |s AS (
        |  SELECT flag, count(*) AS n_rows,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents,
        |    min(cents) AS min_cents, max(cents) AS max_cents
        |  FROM c GROUP BY 1)
        |SELECT flag, n_rows, sum_cents, min_cents, max_cents,
        |  CAST((sum_cents * 100 -
        |    ((sum_cents * 100 % n_rows + n_rows) % n_rows)) / n_rows AS BIGINT)
        |    AS avg_x10000
        |FROM s""".stripMargin,

    // the plain join — Bloom pruning must be invisible to the result
    "q_join_bloom_pruned" ->
      """SELECT l_orderkey, l_linenumber, s_suppkey, s_acctbal
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3""".stripMargin,

    "q_join_m2m" ->
      """WITH big AS (SELECT l_partkey, l_orderkey FROM lineitem WHERE l_quantity >= 45.0)
        |SELECT a.l_partkey, count(*) AS n_pairs
        |FROM big a JOIN big b ON a.l_partkey = b.l_partkey AND a.l_orderkey < b.l_orderkey
        |GROUP BY a.l_partkey""".stripMargin,

    "q_union_distinct" ->
      """SELECT o_custkey AS custkey FROM orders
        |UNION
        |SELECT c_custkey AS custkey FROM customer""".stripMargin,

    "q_set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0""".stripMargin,

    "q_set_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0""".stripMargin,

    "q_union_all" ->
      """SELECT src, count(*) AS n_rows, count(DISTINCT custkey) AS n_keys FROM (
        |  SELECT o_custkey AS custkey, 'order' AS src FROM orders
        |  UNION ALL
        |  SELECT c_custkey AS custkey, 'customer' AS src FROM customer)
        |GROUP BY src""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_dict_encode" ->
      """SELECT row_number() OVER (ORDER BY c_mktsegment) AS segment_id, c_mktsegment
        |FROM (SELECT DISTINCT c_mktsegment FROM customer WHERE c_mktsegment IS NOT NULL)""".stripMargin,

    "q_scalar_string" ->
      """SELECT split_part(p_type, ' ', 1) AS type_head,
        |  CASE WHEN p_size >= 25 THEN 'L' WHEN p_size >= 10 THEN 'M' ELSE 'S' END AS size_class,
        |  count(*) AS n,
        |  max(concat(p_brand, '#', upper(substring(p_type, 1, 3)))) AS max_tag,
        |  CAST(sum(CAST(length(p_name) AS BIGINT)) AS BIGINT) AS sum_name_len,
        |  max(CAST(strpos(p_type, ' ') AS BIGINT)) AS max_first_space
        |FROM part GROUP BY 1, 2""".stripMargin,

    "q_scalar_date" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
        |  count(*) AS n_orders, max(CAST(day(o_orderdate) AS BIGINT)) AS max_day
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "q_join_full" ->
      """WITH oa AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1),
        |cs AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000.0)
        |SELECT coalesce(o_custkey, c_custkey) AS custkey,
        |  CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
        |  CASE WHEN c_custkey IS NULL THEN 'orders_only'
        |       WHEN o_custkey IS NULL THEN 'customer_only'
        |       ELSE 'both' END AS side
        |FROM oa FULL JOIN cs ON o_custkey = c_custkey""".stripMargin,

    "q_merge_snapshot" ->
      """WITH snapshot AS (
        |  SELECT doc_id, text, lang FROM documents WHERE doc_id < 400),
        |batch AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id < 300 THEN 'v2 ' || text ELSE text END AS text,
        |    lang
        |  FROM documents WHERE doc_id >= 200)
        |SELECT coalesce(b.doc_id, s.doc_id) AS doc_id,
        |  CASE WHEN b.doc_id IS NOT NULL THEN b.text ELSE s.text END AS text,
        |  CASE WHEN b.doc_id IS NOT NULL THEN b.lang ELSE s.lang END AS lang,
        |  CASE WHEN s.doc_id IS NULL THEN 'insert'
        |       WHEN b.doc_id IS NULL THEN 'carry'
        |       WHEN b.text IS NOT DISTINCT FROM s.text
        |        AND b.lang IS NOT DISTINCT FROM s.lang THEN 'unchanged'
        |       ELSE 'update' END AS change
        |FROM snapshot s FULL JOIN batch b ON s.doc_id = b.doc_id""".stripMargin,

    "q_set_except" ->
      """SELECT l_partkey, count(*) AS n_excess FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
        |GROUP BY l_partkey""".stripMargin,

    "q_set_intersect" ->
      """SELECT l_partkey, count(*) AS n_common FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
        |GROUP BY l_partkey""".stripMargin,

    "q_agg_rollup" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, o_orderstatus,
        |  count(*) AS n_orders,
        |  sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS sum_price,
        |  CAST(GROUPING(year(o_orderdate), o_orderstatus) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)""".stripMargin,

    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
        |  sum(CAST(floor(l_quantity * 100.0) AS BIGINT)) / 100.0 AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS sum_price,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,

    "q_pivot_langs" ->
      """SELECT source,
        |  count(*) FILTER (WHERE lang = 'de') AS de,
        |  count(*) FILTER (WHERE lang = 'en') AS en,
        |  count(*) FILTER (WHERE lang = 'es') AS es,
        |  count(*) FILTER (WHERE lang = 'fr') AS fr,
        |  count(*) FILTER (WHERE lang = 'zh') AS zh
        |FROM documents GROUP BY source""".stripMargin,

    "q_agg_bool" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
        |  bool_and(o_totalprice > 900.0) AS all_above_900,
        |  bool_or(o_totalprice > 400000.0) AS any_above_400k,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    // try_divide emulated as divide-by-nullif: NULL for zero divisors
    "q_scalar_try" ->
      """SELECT CAST(l_orderkey % 7 AS BIGINT) AS bucket,
        |  CAST(count(l_extendedprice / nullif(l_discount, 0.0)) AS BIGINT) AS n_divisible,
        |  CAST(count(l_quantity / nullif(l_quantity - l_quantity, 0.0)) AS BIGINT)
        |    AS n_div_zero_nonnull,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_transpose_langs" ->
      """SELECT 'n_docs' AS key,
        |  CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS de,
        |  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS en,
        |  CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS es,
        |  CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS fr,
        |  CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS zh
        |FROM documents
        |UNION ALL
        |SELECT 'sum_chars',
        |  CAST(sum(n_chars) FILTER (WHERE lang = 'de') AS BIGINT),
        |  CAST(sum(n_chars) FILTER (WHERE lang = 'en') AS BIGINT),
        |  CAST(sum(n_chars) FILTER (WHERE lang = 'es') AS BIGINT),
        |  CAST(sum(n_chars) FILTER (WHERE lang = 'fr') AS BIGINT),
        |  CAST(sum(n_chars) FILTER (WHERE lang = 'zh') AS BIGINT)
        |FROM documents""".stripMargin,

    "q_dict_extend" ->
      """WITH ex AS (
        |  SELECT CAST(row_number() OVER (ORDER BY lang) AS BIGINT) AS lang_id, lang
        |  FROM (SELECT DISTINCT lang FROM documents
        |        WHERE lang < 'es' AND lang IS NOT NULL)),
        |fresh AS (
        |  SELECT DISTINCT lang FROM documents
        |  WHERE lang IS NOT NULL AND lang NOT IN (SELECT lang FROM ex)),
        |app AS (
        |  SELECT (SELECT coalesce(max(lang_id), 0) FROM ex)
        |    + CAST(row_number() OVER (ORDER BY lang) AS BIGINT) AS lang_id, lang
        |  FROM fresh)
        |SELECT lang_id, lang FROM app
        |UNION ALL SELECT lang_id, lang FROM ex""".stripMargin,

    // mirrors Quality.checkRules/checkUnique/checkReferential face by
    // face: NULL predicate = violation, duplicate keys count rows,
    // null FKs are orphans
    "q_quality_report" -> {
      def rule(name: String, pred: String) =
        s"""SELECT '$name' AS check_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) FILTER (WHERE NOT coalesce($pred, FALSE)) AS BIGINT)
           |    AS n_violations,
           |  count(*) FILTER (WHERE NOT coalesce($pred, FALSE)) = 0 AS passed
           |FROM lineitem""".stripMargin
      def uniq(name: String, table: String, key: String) =
        s"""SELECT '$name' AS check_name, CAST(sum(k) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN k > 1 THEN k ELSE 0 END) AS BIGINT) AS n_violations,
           |  sum(CASE WHEN k > 1 THEN k ELSE 0 END) = 0 AS passed
           |FROM (SELECT $key, count(*) AS k FROM $table GROUP BY 1)""".stripMargin
      def fk(name: String, child: String, ck: String, parent: String, pk: String) =
        s"""SELECT '$name' AS check_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count(*) FILTER (WHERE c.$ck IS NOT NULL
           |    AND pr.k IS NOT NULL) AS BIGINT) AS n_violations,
           |  count(*) = count(*) FILTER (WHERE c.$ck IS NOT NULL
           |    AND pr.k IS NOT NULL) AS passed
           |FROM (SELECT $ck FROM $child) c
           |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parent) pr
           |  ON c.$ck = pr.k""".stripMargin
      Seq(
        rule("lineitem.quantity_positive", "l_quantity > 0"),
        rule("lineitem.quantity_le_30", "l_quantity <= 30"),
        rule("lineitem.discount_range", "l_discount >= 0.0 AND l_discount <= 0.3"),
        rule("lineitem.shipdate_not_null", "l_shipdate IS NOT NULL"),
        uniq("orders.pk_unique", "orders", "o_orderkey"),
        uniq("lineitem.orderkey_unique", "lineitem", "l_orderkey"),
        fk("lineitem.fk_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        fk("orders.fk_customer", "orders", "o_custkey", "customer", "c_custkey")
      ).mkString("\nUNION ALL\n")
    },

    // mirrors Profiler.histogram: same subtract-remainder exact
    // integer bin division over the observed range
    "q_profile_histogram" ->
      """WITH b AS (
        |  SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents
        |  WHERE n_chars IS NOT NULL)
        |SELECT ((n_chars - lo) * 16) // (hi - lo + 1) AS bin,
        |  count(*) AS n_rows,
        |  min(n_chars) AS min_v, max(n_chars) AS max_v
        |FROM documents CROSS JOIN b
        |WHERE n_chars IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "q_quality_k_anonymity" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows,
        |  count(*) < 5 AS violates
        |FROM documents GROUP BY 1, 2""".stripMargin,

    // mirrors Quality.lDiversity: // is DuckDB floor division (n_chars
    // is non-negative, so it matches Spark's DIV); count(DISTINCT)
    // ignores nulls in both engines
    "q_quality_l_diversity" ->
      """SELECT source, n_chars // 256 AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_sensitive,
        |  count(DISTINCT lang) < 3 AS violates
        |FROM documents GROUP BY 1, 2""".stripMargin,

    // mirrors Quality.tCloseness term by term: absent values fold in
    // as (n_tot - covered)·n_c, // is floor division on non-negative
    // integers (matching Spark's DIV), nulls excluded up front
    "q_quality_t_closeness" ->
      """WITH nn AS (
        |  SELECT source, n_chars // 256 AS len_bucket, lang
        |  FROM documents WHERE lang IS NOT NULL),
        |cv AS (
        |  SELECT source, len_bucket, lang, CAST(count(*) AS BIGINT) AS n_cv
        |  FROM nn GROUP BY 1, 2, 3),
        |nc AS (
        |  SELECT source, len_bucket, CAST(sum(n_cv) AS BIGINT) AS n_c
        |  FROM cv GROUP BY 1, 2),
        |gv AS (SELECT lang, CAST(sum(n_cv) AS BIGINT) AS n_v FROM cv GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_v) AS BIGINT) AS n_tot FROM gv),
        |agg AS (
        |  SELECT c.source, c.len_bucket,
        |    CAST(sum(abs(c.n_cv * t.n_tot - g.n_v * n.n_c)) AS BIGINT)
        |      AS sum_present,
        |    CAST(sum(g.n_v) AS BIGINT) AS covered
        |  FROM cv c
        |  JOIN gv g USING (lang)
        |  JOIN nc n USING (source, len_bucket)
        |  CROSS JOIN tot t
        |  GROUP BY 1, 2)
        |SELECT a.source, a.len_bucket, n.n_c AS n_rows,
        |  ((a.sum_present + (t.n_tot - a.covered) * n.n_c) * 1000000)
        |    // (2 * n.n_c * t.n_tot) AS tvd_s,
        |  ((a.sum_present + (t.n_tot - a.covered) * n.n_c) * 1000000)
        |    // (2 * n.n_c * t.n_tot) > 200000 AS violates
        |FROM agg a JOIN nc n USING (source, len_bucket) CROSS JOIN tot t""".stripMargin,

    // mirrors Profiler.correlationMatrix: HUGEINT sufficient statistics
    // (exact like the engine's decimal(38,0) sums), identical final
    // double expression shape (cov / sqrt / sqrt * scale)
    "q_profile_corr" ->
      """WITH x AS (
        |  SELECT CAST(floor(l_quantity * 100.0) AS BIGINT) AS a,
        |    CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS b,
        |    CAST(floor(l_discount * 100.0) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(a AS HUGEINT)) AS sa, sum(CAST(b AS HUGEINT)) AS sb,
        |    sum(CAST(c AS HUGEINT)) AS sc,
        |    sum(CAST(a * a AS HUGEINT)) AS paa, sum(CAST(a * b AS HUGEINT)) AS pab,
        |    sum(CAST(a * c AS HUGEINT)) AS pac, sum(CAST(b * b AS HUGEINT)) AS pbb,
        |    sum(CAST(b * c AS HUGEINT)) AS pbc, sum(CAST(c * c AS HUGEINT)) AS pcc
        |  FROM x),
        |pairs AS (
        |  SELECT 'qty_c' AS col_a, 'price_c' AS col_b, n,
        |    CAST(n AS DOUBLE) * CAST(pab AS DOUBLE) -
        |      CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) AS cov,
        |    CAST(n AS DOUBLE) * CAST(paa AS DOUBLE) -
        |      CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) AS vi,
        |    CAST(n AS DOUBLE) * CAST(pbb AS DOUBLE) -
        |      CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) AS vj
        |  FROM st
        |  UNION ALL
        |  SELECT 'qty_c', 'disc_c', n,
        |    CAST(n AS DOUBLE) * CAST(pac AS DOUBLE) -
        |      CAST(sa AS DOUBLE) * CAST(sc AS DOUBLE),
        |    CAST(n AS DOUBLE) * CAST(paa AS DOUBLE) -
        |      CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE),
        |    CAST(n AS DOUBLE) * CAST(pcc AS DOUBLE) -
        |      CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
        |  FROM st
        |  UNION ALL
        |  SELECT 'price_c', 'disc_c', n,
        |    CAST(n AS DOUBLE) * CAST(pbc AS DOUBLE) -
        |      CAST(sb AS DOUBLE) * CAST(sc AS DOUBLE),
        |    CAST(n AS DOUBLE) * CAST(pbb AS DOUBLE) -
        |      CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE),
        |    CAST(n AS DOUBLE) * CAST(pcc AS DOUBLE) -
        |      CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
        |  FROM st)
        |SELECT col_a, col_b, n AS n_rows,
        |  CASE WHEN vi > 0.0 AND vj > 0.0
        |    THEN CAST(floor(cov / sqrt(vi) / sqrt(vj) * 1000000) AS BIGINT)
        |    ELSE NULL END AS corr_s
        |FROM pairs""".stripMargin,

    // mirrors Profiler.histogramDrift: shared union bounds, same exact
    // bin division, both counts off one scan, fixed-point deviation
    "q_profile_drift" ->
      """WITH a AS (
        |  SELECT n_chars AS v, CAST(doc_id % 2 AS BIGINT) AS side
        |  FROM documents WHERE n_chars IS NOT NULL),
        |b AS (SELECT min(v) AS lo, max(v) AS hi FROM a),
        |binned AS (
        |  SELECT ((v - lo) * 16) // (hi - lo + 1) AS bin,
        |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM a CROSS JOIN b GROUP BY 1),
        |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM binned)
        |SELECT bin, n_ref, n_cur,
        |  CASE WHEN tr = 0 OR tc = 0 THEN NULL
        |    ELSE CAST(floor(abs(CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE) -
        |      CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE)) * 1000000.0)
        |      AS BIGINT) END AS dev_s
        |FROM binned CROSS JOIN t""".stripMargin,

    // the identical mid-square fingerprint ladder (i = 0 term only) and
    // bit_xor fold, re-derived over both snapshot variants
    "q_merge_digest_diff" -> {
      val P = 2147483647L
      def pm(a: String, b: Long) = s"((($a) % $b + $b) % $b)"
      val x = pm("k * 131 + v", P)
      val h1a = pm(s"$x * $x + 12345", P)
      val fp = pm(s"$h1a * $h1a + 6789", P)
      s"""WITH o AS (
         |  SELECT o_orderkey AS k,
         |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS v
         |  FROM orders),
         |c AS (
         |  SELECT k, CASE WHEN k % 971 = 0 THEN v + 1 ELSE v END AS v
         |  FROM o WHERE k % 2003 <> 5),
         |da AS (
         |  SELECT k % 64 AS bucket, bit_xor($fp) AS digest_a,
         |    count(*) AS n_rows_a
         |  FROM o GROUP BY 1),
         |db AS (
         |  SELECT k % 64 AS bucket, bit_xor($fp) AS digest_b,
         |    count(*) AS n_rows_b
         |  FROM c GROUP BY 1)
         |SELECT bucket, digest_a, n_rows_a, digest_b, n_rows_b,
         |  (digest_a IS NOT DISTINCT FROM digest_b AND
         |   n_rows_a IS NOT DISTINCT FROM n_rows_b) AS matches
         |FROM da FULL JOIN db USING (bucket)""".stripMargin
    },

    // the FULL-table compare the digest-guided pipeline must reproduce
    "q_pipeline_reconcile" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS v
        |  FROM orders),
        |c AS (
        |  SELECT k, CASE WHEN k % 971 = 0 THEN v + 1 ELSE v END AS v
        |  FROM o WHERE k % 2003 <> 5),
        |j AS (
        |  SELECT o.k AS ok, c.k AS ck, o.v AS ov, c.v AS cv
        |  FROM o FULL JOIN c ON o.k = c.k)
        |SELECT CASE WHEN ok IS NULL THEN 'insert'
        |    WHEN ck IS NULL THEN 'carry'
        |    WHEN ov IS NOT DISTINCT FROM cv THEN 'unchanged'
        |    ELSE 'update' END AS change,
        |  count(*) AS n
        |FROM j GROUP BY 1""".stripMargin,

    // the same two-order-statistic medians (// is DuckDB integer
    // division = the engine's truncating cast), rank-based trim
    "q_profile_robust" ->
      """WITH r AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS v
        |  FROM lineitem),
        |rk AS (
        |  SELECT flag, v,
        |    row_number() OVER (PARTITION BY flag ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY flag) AS n
        |  FROM r),
        |m AS (
        |  SELECT flag,
        |    CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN v END) +
        |      sum(CASE WHEN rn = n // 2 + 1 THEN v END) AS BIGINT) AS med2,
        |    max(n) AS n_rows
        |  FROM rk GROUP BY 1),
        |dev AS (
        |  SELECT r.flag, abs(r.v * 2 - m.med2) AS dev2
        |  FROM r JOIN m USING (flag)),
        |dk AS (
        |  SELECT flag, dev2,
        |    row_number() OVER (PARTITION BY flag ORDER BY dev2) AS rn,
        |    count(*) OVER (PARTITION BY flag) AS n
        |  FROM dev),
        |mad AS (
        |  SELECT flag,
        |    CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN dev2 END) +
        |      sum(CASE WHEN rn = n // 2 + 1 THEN dev2 END) AS BIGINT) AS mad4
        |  FROM dk GROUP BY 1),
        |tr AS (
        |  SELECT flag,
        |    CAST((sum(v) * 100 - ((sum(v) * 100 % count(*)) + count(*)) % count(*))
        |      // count(*) AS BIGINT) AS trimmed_mean_x100
        |  FROM (SELECT flag, v, rn, n, n // 10 AS cut FROM rk)
        |  WHERE rn > cut AND rn <= n - cut
        |  GROUP BY 1)
        |SELECT flag, n_rows, med2, mad4, trimmed_mean_x100
        |FROM m JOIN mad USING (flag) JOIN tr USING (flag)""".stripMargin,

    // ascending rank over group masses; numerator non-negative by the
    // Chebyshev sum inequality so // matches div
    "q_profile_gini" ->
      """WITH sizes AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |rk AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY x, user_id)
        |    AS BIGINT) AS i
        |  FROM sizes),
        |ag AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(x) AS BIGINT) AS total,
        |    CAST(sum(i * x) AS BIGINT) AS ix
        |  FROM rk)
        |SELECT n_groups, total,
        |  CAST(((2 * ix - (n_groups + 1) * total) * 1000000)
        |    // (n_groups * total) AS BIGINT) AS gini_s
        |FROM ag""".stripMargin,

    // per-category floored logs on exact c/N ratios, pmod-subtract
    // final division (the term sum is negative)
    "q_profile_entropy" ->
      """WITH c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
        |t AS (
        |  SELECT c.c, n.n,
        |    c.c * CAST(floor(ln(CAST(c.c AS DOUBLE) / n.n) * 1e6)
        |      AS BIGINT) AS t
        |  FROM c CROSS JOIN n),
        |ag AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_categories,
        |    CAST(max(n) AS BIGINT) AS n_rows,
        |    CAST(sum(t) AS BIGINT) AS st
        |  FROM t)
        |SELECT n_categories, n_rows,
        |  CAST(-((st - ((st % n_rows + n_rows) % n_rows)) // n_rows)
        |    AS BIGINT) AS entropy_s
        |FROM ag""".stripMargin,

    // the same (rep, ha, hb) literals, Poisson CDF ladder, pmod-subtract
    // floor means, and rank-window interval selection — every constant
    // from the ONE Scala value the operator inlines
    "q_profile_bootstrap_ci" -> {
      val b = 40
      val salt = 101
      val P = graft.text.TextAnalysis.HashMod
      val reps = 0 until b
      val has = reps.map(i => graft.text.TextAnalysis.hashA(salt + i))
      val hbs = reps.map(i => graft.text.TextAnalysis.hashB(salt + i))
      val cdf = graft.sampling.Sampling.poissonCdf100k
      val ladder = cdf.zipWithIndex
        .map { case (t, i) => s"WHEN h < $t THEN $i" }
        .mkString(" ") + s" ELSE ${cdf.size}"
      s"""WITH v AS (
         |  SELECT o_orderkey AS k,
         |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS v
         |  FROM orders),
         |r AS (
         |  SELECT CAST(unnest([${reps.mkString(", ")}]) AS BIGINT) AS rep,
         |    unnest([${has.mkString(", ")}]) AS ha,
         |    unnest([${hbs.mkString(", ")}]) AS hb),
         |e0 AS (
         |  SELECT r.rep, v.v,
         |    ((v.k % $P) * r.ha + r.hb) % $P AS h0
         |  FROM v CROSS JOIN r),
         |e AS (SELECT rep, v, h0 * h0 % $P % 100000 AS h FROM e0),
         |wt AS (SELECT rep, v, CASE $ladder END AS w FROM e),
         |mn AS (
         |  SELECT rep, CAST(sum(w * v) AS BIGINT) AS sv,
         |    CAST(sum(w) AS BIGINT) AS sw
         |  FROM wt GROUP BY 1 HAVING sum(w) > 0),
         |mm AS (
         |  SELECT rep,
         |    CAST((sv * 100 - ((sv * 100 % sw + sw) % sw)) // sw AS BIGINT)
         |      AS m
         |  FROM mn),
         |rk AS (
         |  SELECT m, row_number() OVER (ORDER BY m, rep) AS rn,
         |    count(*) OVER () AS cnt
         |  FROM mm),
         |lo AS (
         |  SELECT m AS ci_lo_x100, CAST(cnt AS BIGINT) AS n_resamples
         |  FROM rk WHERE rn = cnt * 25 // 1000 + 1),
         |hi AS (SELECT m AS ci_hi_x100 FROM rk
         |  WHERE rn = cnt - cnt * 25 // 1000),
         |base AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(v) AS BIGINT) AS sx
         |  FROM v),
         |bm AS (
         |  SELECT n_rows,
         |    CAST((sx * 100 - ((sx * 100 % n_rows + n_rows) % n_rows))
         |      // n_rows AS BIGINT) AS mean_x100
         |  FROM base)
         |SELECT bm.n_rows, bm.mean_x100, lo.ci_lo_x100, hi.ci_hi_x100,
         |  lo.n_resamples
         |FROM bm CROSS JOIN lo CROSS JOIN hi""".stripMargin
    },

    // one grouped subquery per candidate, UNION ALL'd — the relational
    // spelling of Profiler.functionalDependencies (greatest() guards the
    // all-null-dep group in both engines)
    "q_profile_fd" -> fdCandidates.map { case (det, dep) =>
      s"""SELECT '$det' AS det_col, '$dep' AS dep_col,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(sum(greatest(nd - 1, 0)) AS BIGINT) AS n_violations,
         |  sum(greatest(nd - 1, 0)) = 0 AS holds
         |FROM (SELECT $det, count(DISTINCT $dep) AS nd
         |      FROM orders GROUP BY 1)""".stripMargin
    }.mkString("", "\nUNION ALL\n", ""),

    // leading digit of the long integer part (exact, locale-free string
    // head); the expected-mass literals come from the SAME Scala value
    // the operator inlines
    "q_profile_benford" -> {
      val digits = graft.core.Profiler.benfordExpected.map(_._1).mkString(", ")
      val exps = graft.core.Profiler.benfordExpected.map(_._2).mkString(", ")
      s"""WITH obs AS (
         |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
         |      AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |    CAST(count(*) AS BIGINT) AS n_obs
         |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
         |n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM obs),
         |dom AS (SELECT unnest([$digits]) AS digit, unnest([$exps]) AS exp_s)
         |SELECT CAST(dom.digit AS BIGINT) AS digit,
         |  CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
         |  CAST(dom.exp_s AS BIGINT) AS exp_s,
         |  CAST((coalesce(o.n_obs, 0) * 1000000) // n.n_total - dom.exp_s
         |    AS BIGINT) AS dev_s
         |FROM dom LEFT JOIN obs o USING (digit) CROSS JOIN n""".stripMargin
    },

    "q_profile_skew" ->
      """WITH counts AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM counts)
        |SELECT user_id, n_rows,
        |  CAST(floor(CAST(n_rows AS DOUBLE) * 1000000.0
        |    / CAST(n_total AS DOUBLE)) AS BIGINT) AS frac_ppm
        |FROM counts CROSS JOIN tot
        |ORDER BY n_rows DESC, user_id LIMIT 20""".stripMargin,

    "q_join_lateral" ->
      """SELECT n.n_name, t.s_name, t.s_acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT s_name, s_acctbal FROM supplier s
        |  WHERE s.s_nationkey = n.n_nationkey
        |  ORDER BY s_acctbal DESC, s_name LIMIT 2
        |) t""".stripMargin,

    "q_profile_documents" -> {
      // one SELECT per column UNION ALL'd — the relational spelling of
      // the same statistics (DuckDB happily single-scans this too)
      val perCol = Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_v,
           |  CAST(max($c) AS VARCHAR) AS max_v
           |FROM documents""".stripMargin
      }
      perCol.mkString("\nUNION ALL\n")
    },

    "q_layout_zorder" -> {
      // the same interleave formula, generated term by term: bit b of
      // x lands at 2b, bit b of y at 2b+1
      val zTerms = (0 until 10).flatMap(b => Seq(
        s"(((x >> $b) & 1) << ${2 * b})",
        s"(((y >> $b) & 1) << ${2 * b + 1})")).mkString(" | ")
      s"""WITH t AS (
         |  SELECT o_orderkey,
         |    CAST(o_custkey & 1023 AS BIGINT) AS x,
         |    CAST(o_orderkey & 1023 AS BIGINT) AS y
         |  FROM orders WHERE o_orderkey % 7 = 0)
         |SELECT o_orderkey, x, y, CAST($zTerms AS BIGINT) AS z FROM t""".stripMargin
    },

    "q_unpivot_metrics" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric,
        |  sum(CAST(floor(v * 100.0) AS BIGINT)) / 100.0 AS sum_v,
        |  count(*) AS n_rows, min(v) AS min_v, max(v) AS max_v
        |FROM u GROUP BY metric""".stripMargin
  )
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the Deequ-style "expectations"
  * gate a production pipeline runs between ingest and publish: row-level
  * rules, key uniqueness, and referential integrity, each reported as
  * (check_name, n_rows, n_violations, passed) so a single report drives
  * the go/no-go. The reference pipeline relies on count-parity asserts
  * at JDBC load time (`sink.Jdbc`); this generalizes that posture to
  * arbitrary declared constraints on any table.
  *
  * Scale shape, per face:
  *  - [[checkRules]]: ALL rules evaluate in ONE aggregate over ONE scan
  *    (rule count is metadata-bounded); violations are `count_if(NOT p)`
  *    with null-safe semantics — a NULL predicate result is a
  *    violation, because "unknown" must never pass a gate silently.
  *  - [[checkUnique]]: one partial-aggregated groupBy on the key.
  *  - [[checkReferential]]: a left anti-join child→parent on the key —
  *    the orphan count; parent side is whatever join strategy the
  *    optimizer picks (broadcast when small).
  */
object Quality {

  /** Evaluate row-level rules in one pass. A rule's predicate states
    * what GOOD rows satisfy; rows where it is false OR NULL count as
    * violations.
    */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.zipWithIndex.map { case ((_, p), i) =>
      count_if(!coalesce(p, lit(false))).as(s"_v_$i")
    } :+ count(lit(1)).as("_total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check_name"),
        col("_total").as("n_rows"),
        col(s"_v_$i").as("n_violations"),
        (col(s"_v_$i") === 0L).as("passed"))
    }
    wide.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** K-anonymity audit over a quasi-identifier combination — the
    * privacy release gate: a row whose (lang, region, ...) combination
    * is shared by fewer than k rows is re-identifiable by exactly that
    * combination. Reports EVERY equivalence class with its size and a
    * violation flag, so the output is both the audit (any violates ⇒
    * don't release) and the remediation work-list (which classes to
    * generalize or suppress). Null quasi-identifier values form their
    * own classes (a null pattern is itself identifying).
    *
    * Scale shape: one partial-aggregated groupBy on the
    * quasi-identifier columns — output cardinality is the class count,
    * not the corpus.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("violates", col("n_rows") < k)
  }

  /** L-diversity audit — the companion gate to [[kAnonymity]]: a
    * quasi-identifier class can be large enough to pass k-anonymity and
    * still leak the sensitive attribute if every row in the class
    * SHARES that attribute (the homogeneity attack: "all 50 documents
    * from this source+length bucket are German" reveals the language of
    * any member without identifying which row is which). A class is
    * diverse when it carries at least `l` DISTINCT sensitive values.
    * Reports every class with its size and distinct-sensitive count, so
    * the output is both the audit and the remediation work-list, same
    * contract as [[kAnonymity]]. Null sensitive values are not counted
    * toward diversity (count-distinct semantics in both engines) — a
    * class of all-null sensitives has zero diversity and flags.
    *
    * Scale shape: one partial-aggregated groupBy on the
    * quasi-identifier columns; the count-distinct expands to the
    * standard two-level aggregate (partial distinct per map task), so
    * the shuffle carries (class, sensitive) pairs, not rows.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("violates", col("n_sensitive") < l)
  }

  /** T-closeness audit (Li/Li/Venkatasubramanian, ICDE 2007) — the
    * third member of the release-gate triad: a class can pass
    * k-anonymity AND l-diversity and still leak by SKEW ("this class
    * has 3 distinct languages, but 98% of it is German" narrows the
    * sensitive attribute far beyond the global prior). A class is
    * t-close when the distance between its sensitive-value
    * distribution and the GLOBAL distribution is at most t; for a
    * categorical attribute the distance is total variation,
    * ½·Σ_v |p_class(v) − p_global(v)|.
    *
    * All fixed-point: with class size n_c, global size N, per-value
    * counts n_cv / N_v, each term is |n_cv·N − N_v·n_c| / (n_c·N), so
    *   tvd_s = (Σ_v |n_cv·N − N_v·n_c| · scale) div (2·n_c·N)
    * — pure integer, hash-exact in any engine. Values absent from a
    * class contribute N_v·n_c without being materialized:
    * Σ_{absent} N_v = N − Σ_{present} N_v, folded in as
    * (N − covered)·n_c. Null sensitive values are excluded before any
    * count (the l-diversity convention). Headroom: the numerator is
    * ≤ 2·n_c·N·scale, so the default scale holds to n_c·N ≲ 4.6e12 —
    * beyond that drop scale to 1e3 (the fixed-point family note).
    *
    * Scale shape: one partial-aggregated groupBy on (class, value);
    * everything after runs on aggregate-sized frames — class sizes are
    * a second groupBy OF THE FIRST's output, the global value counts
    * and N attach as designed broadcasts (value-domain- and 1-row-
    * sized). No row-level data survives the first shuffle.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tS: Long, scale: Long = 1000000L): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(tS >= 0 && tS <= scale, s"tS must be in [0, $scale], got $tS")
    val q = quasiCols.map(col)
    val nn = df.where(col(sensitiveCol).isNotNull)
      .select((quasiCols :+ sensitiveCol).map(col): _*)
    // the (class, value) aggregate is consumed three times (class
    // sizes, global counts, terms) — localCheckpoint so the row-level
    // scan+shuffle runs once, not three times (aggregate-sized)
    val cv = nn.groupBy((q :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("n_cv"))
      .localCheckpoint()
    val nc = cv.groupBy(q: _*).agg(sum(col("n_cv")).as("n_c"))
    val global = cv.groupBy(col(sensitiveCol)).agg(sum(col("n_cv")).as("n_v"))
    val tot = global.groupBy().agg(sum(col("n_v")).as("n_tot"))
    val terms = cv
      .join(broadcast(global), Seq(sensitiveCol))
      .join(nc, quasiCols)
      .crossJoin(broadcast(tot))
      .select((q :+
        abs(col("n_cv") * col("n_tot") - col("n_v") * col("n_c")).as("term") :+
        col("n_v")): _*)
    terms.groupBy(q: _*)
      .agg(sum(col("term")).as("sum_present"), sum(col("n_v")).as("covered"))
      .join(nc, quasiCols)
      .crossJoin(broadcast(tot))
      .select((q :+ col("n_c").as("n_rows") :+
        expr(s"((sum_present + (n_tot - covered) * n_c) * $scale)" +
          s" DIV (2 * n_c * n_tot)").as("tvd_s")): _*)
      .withColumn("violates", col("tvd_s") > tS)
  }

  /** Key-uniqueness check: n_violations counts the ROWS carrying a
    * duplicated key (a key seen k>1 times contributes k), so the number
    * is directly "rows you would have to drop or merge".
    */
  def checkUnique(df: DataFrame, keyCols: Seq[String],
      checkName: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_k"))
      .agg(sum(col("_k")).as("n_rows"),
        sum(when(col("_k") > 1L, col("_k")).otherwise(0L)).as("n_violations"))
      .select(lit(checkName).as("check_name"), col("n_rows"),
        col("n_violations"), (col("n_violations") === 0L).as("passed"))
  }

  /** Referential-integrity check: n_violations counts child rows whose
    * key has no parent (orphans). Null child keys are orphans too — a
    * null foreign key that should be enforced is declared here, not
    * silently skipped (model a nullable FK by filtering the child
    * first).
    */
  def checkReferential(child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String],
      checkName: String): DataFrame = {
    require(childKeys.nonEmpty && childKeys.length == parentKeys.length,
      "child and parent key lists must be non-empty and same length")
    val p = parent.select(parentKeys.zip(childKeys)
      .map { case (pk, ck) => col(pk).as(s"_p_$ck") }: _*).distinct()
    val joinCond = childKeys.map(ck => col(ck) <=> col(s"_p_$ck")).reduce(_ && _)
    val c = child.select(childKeys.map(col): _*)
    val orphanFree = c.join(p, joinCond, "left_semi")
    val total = c.groupBy().agg(count(lit(1)).as("n_rows"))
    val matched = orphanFree
      .where(childKeys.map(ck => col(ck).isNotNull).reduce(_ && _))
      .groupBy().agg(count(lit(1)).as("_n_matched"))
    total.join(matched)
      .select(lit(checkName).as("check_name"), col("n_rows"),
        (col("n_rows") - col("_n_matched")).as("n_violations"),
        (col("n_rows") === col("_n_matched")).as("passed"))
  }

  /** Compose any number of check faces into one report (unionByName —
    * all faces share the (check_name, n_rows, n_violations, passed)
    * schema).
    */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    checks.reduce(_.unionByName(_))
  }
}

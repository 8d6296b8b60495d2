package graft

import org.apache.spark.sql.functions._

import graft.core.Quality

class QualitySpec extends SparkTestBase {

  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame, name: String) = {
    val r = df.where(col("check_name") === name).collect()
    assert(r.length === 1, s"expected one row for $name")
    (r.head.getLong(1), r.head.getLong(2), r.head.getBoolean(3))
  }

  test("checkRules: NULL predicate results count as violations") {
    val d = Seq((1L, Some(5L)), (2L, None), (3L, Some(-1L)))
      .toDF("id", "v")
    val out = Quality.checkRules(d, Seq(
      "v_positive" -> (col("v") > 0),      // null row + negative row fail
      "id_positive" -> (col("id") > 0)))   // all pass
    assert(row(out, "v_positive") === ((3L, 2L, false)),
      "a NULL predicate must never pass the gate")
    assert(row(out, "id_positive") === ((3L, 0L, true)))
  }

  test("checkUnique counts every row of a duplicated key") {
    val d = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"))
      .toDF("k", "x")
    val out = Quality.checkUnique(d, Seq("k"), "k_unique")
    // key 1 appears 3 times → 3 violation rows, not 1 duplicate key
    assert(row(out, "k_unique") === ((4L, 3L, false)))
    val ok = Quality.checkUnique(d.where(col("x") isin ("a", "d")),
      Seq("k"), "k_unique")
    assert(row(ok, "k_unique") === ((2L, 0L, true)))
  }

  test("checkReferential: orphans and null FKs violate; matches pass") {
    val parent = Seq(10L, 20L).toDF("pk")
    val child = Seq(
      (1L, Some(10L)),  // matched
      (2L, Some(99L)),  // orphan
      (3L, None)        // null FK — an orphan, not a skip
    ).toDF("id", "fk")
    val out = Quality.checkReferential(child, Seq("fk"), parent, Seq("pk"),
      "child.fk")
    assert(row(out, "child.fk") === ((3L, 2L, false)))
    val clean = Quality.checkReferential(child.where(col("id") === 1L),
      Seq("fk"), parent, Seq("pk"), "child.fk")
    assert(row(clean, "child.fk") === ((1L, 0L, true)))
  }

  test("report composes faces; all rules run in one aggregate over one scan") {
    val d = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val rep = Quality.report(Seq(
      Quality.checkRules(d, Seq("a_pos" -> (col("a") > 0), "b_pos" -> (col("b") > 0))),
      Quality.checkUnique(d, Seq("a"), "a_unique")))
    assert(rep.collect().length === 3)
    // one-scan contract: the rules face contains exactly one aggregate
    // pair (partial+final) and no join
    val p = Quality.checkRules(d,
      Seq("a_pos" -> (col("a") > 0), "b_pos" -> (col("b") > 0)))
      .queryExecution.executedPlan
    val scans = p.collect {
      case s: org.apache.spark.sql.execution.LeafExecNode => s
    }
    assert(scans.length === 1, "all rules must share one scan")
  }

  test("kAnonymity flags classes under k; nulls form their own class") {
    import spark.implicits._
    val rows = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"), // class of 3
      ("de", "web"), // singleton
      (null.asInstanceOf[String], "web"), (null.asInstanceOf[String], "web"))
      .toDF("lang", "source")
    val got = graft.core.Quality.kAnonymity(rows, Seq("lang", "source"), k = 3)
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(got((Some("en"), "web")) === ((3L, false)))
    assert(got((Some("de"), "web")) === ((1L, true)))
    assert(got((None, "web")) === ((2L, true)), "null pattern is a class")
  }

  test("lDiversity flags homogeneous classes; null sensitives don't count") {
    import spark.implicits._
    val rows = Seq(
      // class "web": 3 rows, 2 distinct langs -> diverse at l=2
      ("web", "en"), ("web", "en"), ("web", "de"),
      // class "print": 3 rows, all "en" -> homogeneous, flags
      ("print", "en"), ("print", "en"), ("print", "en"),
      // class "scan": nulls carry no diversity -> n_sensitive 1, flags
      ("scan", "en"), ("scan", null.asInstanceOf[String]))
      .toDF("source", "lang")
    val got = graft.core.Quality.lDiversity(rows, Seq("source"), "lang", l = 2)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got("web") === ((3L, 2L, false)))
    assert(got("print") === ((3L, 1L, true)), "homogeneity attack flags")
    assert(got("scan") === ((2L, 1L, true)), "null adds no diversity")
    intercept[IllegalArgumentException] {
      graft.core.Quality.lDiversity(rows, Seq("lang"), "lang", l = 2)
    }
  }
}

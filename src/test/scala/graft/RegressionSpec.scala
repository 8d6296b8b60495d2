package graft

import org.apache.spark.sql.functions._

import graft.ml.Regression

class RegressionSpec extends SparkTestBase {

  import spark.implicits._

  test("fitLineExact recovers an exact line and reports exact rationals") {
    // y = 3x + 7 exactly → slope_num/slope_den reduces to 3
    val d = (0L to 99L).map(x => ("g", x, 3 * x + 7)).toDF("g", "x", "y")
    val r = Regression.fitLineExact(d, Seq("g"), "x", "y").head()
    assert(r.getAs[Long]("slope_num") === 3L * r.getAs[Long]("slope_den"))
    assert(r.getAs[Double]("slope") === 3.0)
    assert(r.getAs[Long]("n") === 100L)
  }

  test("fitLineExact: zero x-variance yields null slope, not a crash") {
    val d = Seq(("g", 5L, 1L), ("g", 5L, 9L)).toDF("g", "x", "y")
    val r = Regression.fitLineExact(d, Seq("g"), "x", "y").head()
    assert(r.getAs[Long]("slope_den") === 0L)
    assert(r.isNullAt(r.fieldIndex("slope")))
  }

  test("fitLineExact is partitioning-independent (integer sums commute)") {
    val d = (1L to 500L).map(x => ((x % 3).toString, x, x * x % 97))
      .toDF("g", "x", "y")
    def run(df: org.apache.spark.sql.DataFrame) =
      Regression.fitLineExact(df, Seq("g"), "x", "y")
        .collect()
        .map(r => (r.getString(0), r.getAs[Long]("slope_num"),
          r.getAs[Long]("slope_den"))).toSet
    assert(run(d) === run(d.repartition(17)))
  }
}

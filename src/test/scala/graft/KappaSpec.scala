package graft

import graft.ml.Evaluation

class KappaSpec extends SparkTestBase {

  private def pairs(cells: (String, String, Int)*) = {
    import spark.implicits._
    cells.flatMap { case (a, b, n) => Seq.fill(n)((a, b)) }.toDF("a", "b")
  }

  private def kappa(df: org.apache.spark.sql.DataFrame) = {
    val r = Evaluation.cohensKappa(df, "a", "b").collect()
    assert(r.length === 1)
    (r.head.getLong(0), r.head.getLong(1),
      if (r.head.isNullAt(2)) None else Some(r.head.getLong(2)))
  }

  test("the textbook 2x2 example gives kappa 0.4") {
    // p_o = 35/50 = .7; p_e = (25·30 + 25·20)/2500 = .5; κ = .2/.5 = .4
    val got = kappa(pairs(("y", "y", 20), ("y", "n", 5),
      ("n", "y", 10), ("n", "n", 15)))
    assert(got === ((50L, 35L, Some(400000L))))
  }

  test("perfect agreement is 1, perfect disagreement is negative") {
    assert(kappa(pairs(("y", "y", 7), ("n", "n", 3)))._3 === Some(1000000L))
    // 5/5 split with zero agreement: κ = (0 − .5)/(1 − .5) = −1
    assert(kappa(pairs(("y", "n", 5), ("n", "y", 5)))._3 === Some(-1000000L))
  }

  test("both-constant raters report null; null labels are excluded") {
    assert(kappa(pairs(("y", "y", 9)))._3 === None)
    import spark.implicits._
    val withNulls = pairs(("y", "y", 20), ("y", "n", 5),
      ("n", "y", 10), ("n", "n", 15)).unionAll(
      Seq((null: String, "y"), ("n", null: String)).toDF("a", "b"))
    assert(kappa(withNulls) === ((50L, 35L, Some(400000L))))
  }
}

package graft

import graft.core.Quality

class TClosenessSpec extends SparkTestBase {

  // global: a×6, b×4 (N=10) → p_global = (0.6, 0.4)
  //   X: aaa b  → p=(.75,.25) → tvd .15
  //   Y: a bbb  → p=(.25,.75) → tvd .35
  //   W: aa     → p=(1, 0)    → tvd .40 (absent-value fold: b never
  //                             appears in W but contributes N_b·n_c)
  private def rows = {
    import spark.implicits._
    Seq("X" -> "a", "X" -> "a", "X" -> "a", "X" -> "b",
      "Y" -> "a", "Y" -> "b", "Y" -> "b", "Y" -> "b",
      "W" -> "a", "W" -> "a").toDF("grp", "v")
  }

  private def audit(df: org.apache.spark.sql.DataFrame) =
    Quality.tCloseness(df, Seq("grp"), "v", tS = 30L, scale = 100L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap

  test("total variation distances match the hand computation") {
    val got = audit(rows)
    assert(got("X") === ((4L, 15L, false)))
    assert(got("Y") === ((4L, 35L, true)))
    assert(got("W") === ((2L, 40L, true)))
  }

  test("null sensitive values are excluded before any count") {
    import spark.implicits._
    val withNulls = rows.unionAll(
      Seq(("X", null: String), ("W", null: String)).toDF("grp", "v"))
    assert(audit(withNulls) === audit(rows))
  }

  test("a class mirroring the global distribution is exactly 0-close") {
    import spark.implicits._
    val mirrored = rows.unionAll(
      Seq("Z" -> "a", "Z" -> "a", "Z" -> "a", "Z" -> "b", "Z" -> "b")
        .toDF("grp", "v"))
    // adding Z (3a, 2b) shifts the global to (9a, 6b) = (.6, .4) — Z
    // itself sits exactly on it
    val z = audit(mirrored)("Z")
    assert(z === ((5L, 0L, false)))
  }
}

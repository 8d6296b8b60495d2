package graft

import graft.core.Profiler

class ProfilerSpec extends SparkTestBase {

  test("profile computes rows/nulls/distincts/min-max per column") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")), (3L, Some("a")))
      .toDF("k", "v")
    val out = Profiler.profile(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(out("k") === ((4L, 0L, 3L, "1", "3")))
    assert(out("v") === ((4L, 1L, 2L, "a", "b")))
  }

  test("all statistics come from ONE scan of the source") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // sparkPlan, not executedPlan: AQE wraps the latter in an opaque
    // AdaptiveSparkPlanExec that collect() cannot traverse
    val scans = Profiler.profile(docs, Seq("doc_id", "text", "lang"))
      .queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    assert(scans.size === 1,
      s"profiler must single-scan the table, found ${scans.size} scans")
  }

  test("histogramDrift: shared edges, exact counts, TVD reads off dev_s") {
    import spark.implicits._
    // ref uniform over [0, 40); cur shifted into the top half only
    val ref = (0 until 40).map(i => Tuple1(i.toLong)).toDF("v")
    val cur = (0 until 40).map(i => Tuple1(20L + (i % 20))).toDF("v")
    val got = Profiler.histogramDrift(ref, cur, "v", bins = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // shared range [0, 39]: bins 0..3 hold refs 10 each; cur all in 2..3
    assert(got(0L) === ((10L, 0L, 250000L)))
    assert(got(1L) === ((10L, 0L, 250000L)))
    assert(got(2L) === ((10L, 20L, 250000L)))
    assert(got(3L) === ((10L, 20L, 250000L)))
    // total variation = sum(dev)/2 = 0.5: half the mass moved
    assert(got.values.map(_._3).sum === 1000000L)
  }

  test("histogram bins exactly past 2^53 numerators (long integral div)") {
    import spark.implicits._
    // lo = 0, hi = 2^61 − 2 ⇒ d = 2^61 − 1 (exactly Long.MaxValue/4,
    // the widest span the guard admits at bins = 4); v = 2^59 − 1
    // gives numerator x = 2^61 − 4 < d, so the exact bin is 0 — but
    // both x and d round to the SAME double 2^61 (spacing 256 there),
    // so double division returns 1.0 and misbins. The top value pins
    // bin 3.
    val df = Seq(0L, (1L << 59) - 1, (1L << 61) - 2).toDF("v")
    val got = Profiler.histogram(df, "v", bins = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 2L, 3L -> 1L))
  }

  test("histogram fails loudly when span·bins would overflow long") {
    import spark.implicits._
    val df = Seq(0L, Long.MaxValue / 2).toDF("v")
    val e = intercept[Exception] {
      Profiler.histogram(df, "v", bins = 4).collect()
    }
    assert(e.getMessage.contains("exceeds Long.MaxValue/bins"))
  }

  test("histogramDrift bins exactly past 2^53 numerators") {
    import spark.implicits._
    val ref = Seq(0L, (1L << 59) - 1).toDF("v")
    val cur = Seq((1L << 61) - 2).toDF("v")
    val got = Profiler.histogramDrift(ref, cur, "v", bins = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(0L -> ((2L, 0L)), 3L -> ((0L, 1L))))
  }

  test("correlationMatrix: exact statistics, straight-line reference agreement") {
    import spark.implicits._
    val data = Seq((1L, 2L, 7L), (2L, 4L, 5L), (3L, 6L, 3L), (4L, 8L, 1L),
      (5L, 10L, 4L))
    val got = Profiler.correlationMatrix(
        data.toDF("x", "y", "z"), Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // independent straight-line reference with the same expression shape
    def ref(a: Seq[Long], b: Seq[Long]): Long = {
      val n = a.size.toDouble
      val cov = n * a.zip(b).map { case (p, q) => p * q }.sum.toDouble -
        a.sum.toDouble * b.sum.toDouble
      val vi = n * a.map(p => p * p).sum.toDouble - a.sum.toDouble * a.sum.toDouble
      val vj = n * b.map(p => p * p).sum.toDouble - b.sum.toDouble * b.sum.toDouble
      math.floor(cov / math.sqrt(vi) / math.sqrt(vj) * 1e6).toLong
    }
    val (xs, ys, zs) = (data.map(_._1), data.map(_._2), data.map(_._3))
    assert(got(("x", "y")) === ((5L, Some(ref(xs, ys)))))
    assert(got(("x", "z")) === ((5L, Some(ref(xs, zs)))))
    assert(got(("y", "z")) === ((5L, Some(ref(ys, zs)))))
    // y = 2x is perfectly correlated; x vs z strongly negative
    assert(got(("x", "y"))._2.get >= 999999L)
    assert(got(("x", "z"))._2.get < 0L)
  }

  test("correlationMatrix: zero variance yields null; nulls delete listwise") {
    import spark.implicits._
    val df = Seq((Some(1L), 5L), (Some(2L), 5L), (None, 9L), (Some(3L), 5L))
      .toDF("x", "c")
    val rows = Profiler.correlationMatrix(df, Seq("x", "c")).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(2) === 3L, "null row must be excluded from n")
    assert(rows.head.isNullAt(3), "constant column correlation must be null")
  }

  test("correlationMatrix: values past the 32-bit headroom fail loudly") {
    import spark.implicits._
    val df = Seq((1L, 5L), (1L << 40, 6L)).toDF("x", "y")
    val e = intercept[Exception] {
      Profiler.correlationMatrix(df, Seq("x", "y")).collect()
    }
    assert(e.getMessage.contains("product headroom"))
  }

  test("histogramDrift: an empty side reports null deviation, not a crash") {
    import spark.implicits._
    val ref = Seq(1L, 2L, 3L).toDF("v")
    val cur = ref.where(org.apache.spark.sql.functions.col("v") < 0)
    val got = Profiler.histogramDrift(ref, cur, "v", bins = 2).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.isNullAt(3), "dev_s must be null on empty side"))
  }

  test("functionalDependencies: holds, violation counts, null det group") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"),          // k→v holds so far
      (3L, "b", "x"), (3L, "b", "y"),          // det 3 sees two vs
      (4L, "c", "x"), (4L, "c", "x"))          // duplicates are fine
      .toDF("k", "g", "v")
    val got = Profiler.functionalDependencies(df,
        Seq("k" -> "g", "k" -> "v", "g" -> "v"))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("k", "g")) === ((4L, 0L, true)))
    assert(got(("k", "v")) === ((4L, 1L, false)))   // det 3 → {x, y}
    assert(got(("g", "v")) === ((3L, 1L, false)))   // b → {x, y}
  }

  test("functionalDependencies: null dets group, null deps ignored") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("x")), (None, Some("x")), (None, Some("y")),
      (Some(2L), None))
      .toDF("k", "v")
    val got = Profiler.functionalDependencies(df, Seq("k" -> "v"))
      .as[(String, String, Long, Long, Boolean)].collect().head
    // keys: 1, 2, NULL; violations: NULL det sees {x, y} → 1; det 2's
    // all-null dep contributes max(0−1, 0) = 0, not −1
    assert((got._3, got._4, got._5) === ((3L, 1L, false)))
  }

  test("giniOfGroups: even mass 0-ish, concentrated mass near 1") {
    import spark.implicits._
    // perfectly even: 4 groups × 5 rows → gini exactly 0
    val even = (0 until 20).map(i => Tuple1(s"g${i % 4}")).toDF("g")
    val e = Profiler.giniOfGroups(even, "g")
      .as[(Long, Long, Long)].collect().head
    assert(e === ((4L, 20L, 0L)))
    // one group holds 97 of 100 rows: gini = hand formula
    val skew = (Seq.fill(97)("big") ++ Seq("a", "b", "c")).map(Tuple1(_))
      .toDF("g")
    val s = Profiler.giniOfGroups(skew, "g").as[(Long, Long, Long)]
      .collect().head
    // sorted x = (1,1,1,97), Σix = 1+2+3+4·97 = 394, n=4, Σx=100
    // gini = (788 − 500)·1e6 / 400 = 720000
    assert(s === ((4L, 100L, 720000L)))
  }

  test("entropyOf: uniform = ln k, single category = 0, nulls excluded") {
    import spark.implicits._
    val uni = (0 until 30).map(i => Tuple1(s"c${i % 3}")).toDF("v")
    val u = Profiler.entropyOf(uni, "v").as[(Long, Long, Long)]
      .collect().head
    // per-category term: 10·floor(ln(1/3)·1e6) = 10·(−1098613)
    // H_s = −floor(−10986130/30) = 1098613 — exactly floor(ln 3 ·1e6)+1?
    // replay the operator's own arithmetic:
    val t = 10L * math.floor(math.log(10.0 / 30.0) * 1e6).toLong * 3
    val h = -Math.floorDiv(t, 30L)
    assert(u === ((3L, 30L, h)))
    val single = (0 until 9).map(_ => Tuple1("x")).toDF("v")
    assert(Profiler.entropyOf(single, "v").as[(Long, Long, Long)]
      .collect().head === ((1L, 9L, 0L)))
    val withNulls = (Seq("a", "a", null, "b")).map(Tuple1(_)).toDF("v")
    val w = Profiler.entropyOf(withNulls, "v").as[(Long, Long, Long)]
      .collect().head
    assert(w._1 === 2L && w._2 === 3L, "null rows excluded from N")
  }

  test("benford: digit extraction, full domain, exact deviations") {
    import spark.implicits._
    // 10 values ≥ 1: leading digits 1×5, 2×3, 9×2; plus excluded 0.5, 0
    val df = Seq(1.0, 12.3, 150.0, 1999.0, 1.7, 2.0, 25.0, 299.9, 9.0,
        90000.0, 0.5, 0.0).toDF("v")
    val got = Profiler.benford(df, "v")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size === 9, "all nine digits present")
    assert(got(1L)._1 === 5L)
    assert(got(2L)._1 === 3L)
    assert(got(9L)._1 === 2L)
    assert(got(3L)._1 === 0L, "absent digits coalesce to 0")
    // dev_s replay: (n_obs·1e6) div 10 − floor(log10(1+1/d)·1e6)
    def exp(d: Int) = math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong
    assert(got(1L) === ((5L, exp(1), 500000L - exp(1))))
    assert(got(3L) === ((0L, exp(3), -exp(3))))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.analytics.TimeSeries

/** Time-series statistics: autocorrelation against an in-test exact
  * reference, moving-sum weights and gap semantics, and the loud
  * overflow guards.
  */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def refAutocorr(xs: Seq[(Long, Long)], step: Long, lag: Int): Option[Long] = {
    val m = xs.toMap
    val pairs = xs.flatMap { case (t, xa) => m.get(t + lag * step).map(xb => (xa, xb)) }
    if (pairs.isEmpty) return None
    val n = pairs.size.toDouble
    val sa = pairs.map(_._1).sum.toDouble
    val sb = pairs.map(_._2).sum.toDouble
    val paa = pairs.map(p => p._1 * p._1).sum.toDouble
    val pab = pairs.map(p => p._1 * p._2).sum.toDouble
    val pbb = pairs.map(p => p._2 * p._2).sum.toDouble
    val cov = n * pab - sa * sb
    val vi = n * paa - sa * sa
    val vj = n * pbb - sb * sb
    if (vi > 0.0 && vj > 0.0) Some(math.floor(cov / math.sqrt(vi) / math.sqrt(vj) * 1e6).toLong)
    else None
  }

  test("autocorrelation matches the exact reference on a seeded series") {
    val rnd = new scala.util.Random(41)
    val series = (0L until 200L).map(i => (i * 60L, (rnd.nextInt(50) + 10).toLong))
    val got = TimeSeries.autocorrelation(series.toDF("t", "x"), step = 60L, maxLag = 5)
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    for (lag <- 1 to 5) {
      val expected = refAutocorr(series, 60L, lag)
      assert(got(lag.toLong)._2 === expected, s"lag $lag")
      assert(got(lag.toLong)._1 === 200L - lag, s"n at lag $lag")
    }
  }

  test("a perfectly periodic series autocorrelates at its period") {
    // period 4: lag 4 correlation exactly 1e6; lag 2 strongly negative
    val series = (0L until 80L).map(i => (i, Seq(10L, 20L, 30L, 20L)(i.toInt % 4)))
    val got = TimeSeries.autocorrelation(series.toDF("t", "x"), step = 1L, maxLag = 4)
      .as[(Long, Long, Option[Long])].collect().map(r => r._1 -> r._3).toMap
    assert(got(4L) === Some(1000000L))
    assert(got(2L).get < -900000L)
  }

  test("constant series yields null correlation, not a crash") {
    val series = (0L until 20L).map(i => (i, 7L))
    val got = TimeSeries.autocorrelation(series.toDF("t", "x"), step = 1L, maxLag = 2)
      .as[(Long, Long, Option[Long])].collect()
    assert(got.forall(_._3.isEmpty))
  }

  test("gap semantics: pairs with a missing partner bucket drop out") {
    // buckets 0,1,2,4 — lag 1 pairs: (0,1),(1,2) only (3 missing twice)
    val series = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 9L))
    val got = TimeSeries.autocorrelation(series.toDF("t", "x"), step = 1L, maxLag = 1)
      .as[(Long, Long, Option[Long])].collect()
    assert(got.head._2 === 2L)
  }

  test("moving sum matches the brute-force filter on seeded gappy series") {
    val rnd = new scala.util.Random(83)
    val series = (0L until 150L).filter(_ => rnd.nextBoolean())
      .map(t => (t, (rnd.nextInt(100) + 1).toLong))
    val m = series.toMap
    val taps = 10
    val expected = series.map { case (t, _) =>
      t -> (0 until taps).map(j => m.getOrElse(t - j, 0L) * (1L << (taps - 1 - j))).sum
    }.toMap
    val got = TimeSeries.exponentialMovingSum(series.toDF("t", "x"), step = 1L,
        taps = taps)
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("moving sum applies halving weights and treats gaps as zero") {
    // taps=3, weights current=4, -1=2, -2=1
    val series = Seq((0L, 1L), (1L, 1L), (3L, 1L))
    val got = TimeSeries.exponentialMovingSum(series.toDF("t", "x"), step = 1L, taps = 3)
      .as[(Long, Long)].collect().toMap
    // t=0: 4·1 = 4;  t=1: 4·1+2·1 = 6;  t=3: 4·1 + 0 + 1·1(t=1) = 5
    assert(got === Map(0L -> 4L, 1L -> 6L, 3L -> 5L))
  }

  test("cross-correlation peaks at the true lead lag") {
    // b is a copied a shifted +2 steps: corr at lag +2 is exactly 1e6
    val rnd = new scala.util.Random(59)
    val a = (0L until 100L).map(i => (i, (rnd.nextInt(40) + 5).toLong))
    val b = a.map { case (t, x) => (t + 2L, x) }
    val got = TimeSeries.crossCorrelation(
        a.toDF("t", "x"), b.toDF("t", "y"), step = 1L, maxLag = 3)
      .as[(Long, Long, Option[Long])].collect().map(r => r._1 -> r._3).toMap
    assert(got(2L) === Some(1000000L))
    assert(got.keySet === (-3L to 3L).toSet)
    // the mirrored negative lag is just noise, far from 1
    assert(got(-2L).forall(v => math.abs(v) < 900000L))
  }

  test("overflow guards fail loudly") {
    val big = Seq((0L, Long.MaxValue / 2)).toDF("t", "x")
    val e1 = intercept[Exception] {
      TimeSeries.autocorrelation(big, 1L, 1).collect()
    }
    assert(e1.getMessage.contains("headroom"))
    val e2 = intercept[Exception] {
      TimeSeries.exponentialMovingSum(big, 1L, taps = 30).collect()
    }
    assert(e2.getMessage.contains("overflow"))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.Events

/** Batch event-analytics operators (retention, attribution) and the
  * histogram profiler — semantics the oracle hash can't articulate:
  * cohort assignment, horizon cuts, tie handling, bin edges.
  */
class EventsAnalyticsSpec extends SparkTestBase {

  import spark.implicits._

  private def ev(id: Long, day: Int, user: Long, typ: String, v: Double = 1.0) =
    (id, Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), user, typ, v)

  test("cohortRetention keys users to their first bucket") {
    // week buckets; 2024-01-01..07 is one epoch week, 08..14 the next
    val events = Seq(
      ev(1, 2, 100, "click"), ev(2, 9, 100, "click"),  // cohort w, active w+1
      ev(3, 9, 200, "click"),                          // cohort w+1 only
      ev(4, 2, 300, "click"), ev(5, 3, 300, "click")   // cohort w, twice in-week
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = Events.cohortRetention(events)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w0 = rows.map(_._1).min
    val got = rows.map { case (c, o, u, e) => (c - w0, o, u, e) }.toSet
    // users 100+300 share the first cohort (offset 0: 2 users, 3
    // events; user 100 returns at offset 1); user 200's FIRST event is
    // a week later, so it seeds the NEXT cohort at offset 0 — cohorts
    // key on first-seen bucket, not on calendar weeks events fall in
    assert(got === Set((0L, 0L, 2L, 3L), (0L, 1L, 1L, 1L), (1L, 0L, 1L, 1L)))
  }

  test("lastTouchAttribution: horizon cut, latest wins, tie on max id") {
    def at(id: Long, hhmm: String, user: Long, typ: String, v: Double = 0.0) =
      (id, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), user, typ, v)
    val events = Seq(
      at(1, "10:00", 7, "click"),
      at(2, "10:30", 7, "click"),          // latest in-horizon touch
      at(3, "10:45", 7, "purchase", 9.0),  // → touch 2, latency 15 min
      at(4, "13:00", 7, "purchase", 5.0),  // 2.5h since touch 2 → null
      at(5, "09:00", 8, "purchase", 1.0),  // no touch at all → null
      // user 9: two clicks at the SAME ts — max event_id must win
      at(6, "11:00", 9, "click"), at(7, "11:00", 9, "click"),
      at(8, "11:10", 9, "purchase", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.lastTouchAttribution(events)
      .select("event_id", "touch_event_id", "latency_s")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap
    assert(got === Map(
      3L -> ((Some(2L), Some(900L))),
      4L -> ((None, None)),
      5L -> ((None, None)),
      8L -> ((Some(7L), Some(600L)))))
  }

  test("histogram: exact equi-width bins, extremes in first/last bin") {
    val d = (0L to 100L).map(i => (i, i)).toDF("doc_id", "n_chars")
    val got = graft.core.Profiler.histogram(d, "n_chars", bins = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // range [0,100], width 101/4: bin = v*4 div 101
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got(0L)._2 === 0L && got(3L)._3 === 100L)
    assert(got.values.map(_._1).sum === 101L, "every non-null row lands in a bin")
    // bin boundaries are exactly v*4 div 101
    assert(got(0L)._3 === 25L && got(1L)._2 === 26L)
    // single-value degenerate range: everything in bin 0
    val one = Seq((1L, 42L), (2L, 42L)).toDF("doc_id", "n_chars")
    val deg = graft.core.Profiler.histogram(one, "n_chars", bins = 8).collect()
    assert(deg.length === 1 && deg.head.getLong(0) === 0L)
  }

  test("histogram excludes nulls from range and counts") {
    val d = Seq((1L, Some(10L)), (2L, None), (3L, Some(20L)))
      .toDF("doc_id", "n_chars")
    val got = graft.core.Profiler.histogram(d, "n_chars", bins = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.sum === 2L)
  }

  test("robustStats: exact median/MAD both parities; outlier barely moves them") {
    import spark.implicits._
    /** Reference: doubled median by the same two-order-statistic rule. */
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      s((n + 1) / 2 - 1) + s(n / 2)
    }
    def ref(xs: Seq[Long]): (Long, Long, Long) = {
      val m2 = med2(xs)
      val mad4 = med2(xs.map(v => math.abs(2 * v - m2)))
      val cut = xs.length / 10
      val kept = xs.sorted.slice(cut, xs.length - cut)
      (m2, mad4, kept.sum * 100 / kept.length)
    }
    val odd = (1L to 9L).toSeq
    val withOutlier = odd :+ 100000L // even count + a massive outlier
    for ((name, xs) <- Seq("odd" -> odd, "outlier" -> withOutlier)) {
      val d = xs.map(("g", _)).toDF("g", "v")
      val row = graft.core.Profiler.robustStats(d, "g", "v")
        .select("med2", "mad4", "trimmed_mean_x100")
        .as[(Long, Long, Long)].head()
      assert(row === ref(xs), name)
    }
    // robustness: the outlier moves the doubled median only 1 step
    // (9→10: even-count upper middle) and MAD stays bounded
    assert(math.abs(ref(withOutlier)._1 - ref(odd)._1) <= 1)
    assert(ref(withOutlier)._2 <= ref(odd)._2 + 2)
  }

  test("stickiness: exact sliding distincts, truncated head, trailing rows") {
    import spark.implicits._
    // user 1 active days 1-10; user 2 active day 3 only
    val rows = ((1 to 10).map(d => (d.toLong, 1L)) :+ ((3L, 2L))).map {
      case (d, u) =>
        (java.sql.Timestamp.valueOf(f"2024-04-${d.toInt}%02d 01:00:00"), u, 1.0)
    }
    val got = graft.streaming.Events.stickiness(
        rows.toDF("ts", "user_id", "value"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val day3 = rows(2)._1.getTime / 1000 / 86400
    // day 3: dau 2, wau 2 (truncated trailing window) → 1.0
    assert(got(day3) === ((2L, 2L, 1000000L)))
    // day 9: dau 1, wau covers days 3..9 → both users → 1/2
    assert(got(day3 + 6) === ((1L, 2L, 500000L)))
    // day 10: window 4..10 → user 2 aged out → 1/1
    assert(got(day3 + 7) === ((1L, 1L, 1000000L)))
    // no rows past the last active day
    assert(!got.contains(day3 + 8))
    assert(got.size === 10)
  }

  test("seasonalNaiveBacktest: perfect weekly pattern scores MAE 0") {
    import spark.implicits._
    // 21 days of a 7-day repeating value pattern: lag-7 predicts exactly
    val rows = (0 until 21).map { d =>
      (java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 10:00:00"),
        "m", (d % 7 + 1) * 1.0)
    }
    val got = graft.streaming.Events.seasonalNaiveBacktest(
        rows.toDF("ts", "event_type", "value"))
      .as[(String, Long, Long, Long)].collect().head
    assert(got === (("m", 14L, 0L, 0L)))
  }

  test("seasonalNaiveBacktest: constant level shift yields exact MAE") {
    import spark.implicits._
    // week 1 value 1.00, weeks 2-3 value 3.00: scored days 8..21;
    // days 8-14 err |300−100|=200, days 15-21 err 0 → MAE 1400/14=100
    val rows = (0 until 21).map { d =>
      (java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 10:00:00"),
        "m", if (d < 7) 1.0 else 3.0)
    }
    val got = graft.streaming.Events.seasonalNaiveBacktest(
        rows.toDF("ts", "event_type", "value"))
      .as[(String, Long, Long, Long)].collect().head
    assert(got === (("m", 14L, 1400L, 100L)))
  }

  test("changePoints finds a planted level shift at the shift day") {
    import spark.implicits._
    // 10 days at value 1.00, then 10 days at 5.00: the CUSUM deviation
    // peaks at the last low day (day index 10)
    val rows = (0 until 20).map { d =>
      (java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        "m", if (d < 10) 1.0 else 5.0)
    }
    val got = graft.streaming.Events.changePoints(
        rows.toDF("ts", "event_type", "value"))
      .as[(String, Long, Long, Long)].collect().head
    val day10 = rows(9)._1.getTime / 1000 / 86400
    // C_10·n − T·10 = 1000·20 − 6000·10 → |−40000|
    assert(got === (("m", day10, 40000L, 20L)))
  }

  test("changePoints: flat series peaks nowhere meaningful, ties to earliest") {
    import spark.implicits._
    val rows = (0 until 5).map { d =>
      (java.sql.Timestamp.valueOf(f"2024-02-${d + 1}%02d 00:30:00"), "m", 2.0)
    }
    val got = graft.streaming.Events.changePoints(
        rows.toDF("ts", "event_type", "value"))
      .as[(String, Long, Long, Long)].collect().head
    // perfectly proportional ramp: every stat is 0; earliest day wins
    assert(got._2 === rows.head._1.getTime / 1000 / 86400)
    assert(got._3 === 0L)
  }
}

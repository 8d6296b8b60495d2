package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.ids.Ids

/** Event-stream operators over `events(event_id, ts, user_id,
  * event_type, value, props)`.
  *
  * Each operator has two faces sharing one transform definition:
  * a batch DataFrame face (oracle-checkable) and a Structured Streaming
  * face (`readStream` → watermark → same aggregation → `writeStream`).
  * The reference pipeline is batch-only (SURVEY.md §2.11) — this module
  * is the forward-looking streaming surface a 100 TB ingest needs.
  *
  * Scale notes: tumbling windows aggregate map-side per (window, type)
  * before the shuffle; sessionization shuffles once on user_id and the
  * streaming face keeps per-user state bounded by the gap timeout.
  */
object Events {

  /** Tumbling-window counts + value sums per event_type. Deterministic
    * fixed-point value sums so DuckDB reproduces them exactly.
    */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Ids.fixedPointSum(col("value"), 2).as("sum_value"))
      .select(col("w.start").cast("long").as("window_start_s"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming face of tumblingCounts: identical aggregation with a
    * watermark for state eviction. Append-mode compatible.
    */
  def streamingTumblingCounts(stream: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Ids.fixedPointSum(col("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window counts per event_type (width/slide, epoch-aligned —
    * each event lands in width/slide windows). Spark expands the
    * windows BEFORE the aggregation, so the shuffle carries
    * (window, type) partial counts, not events.
    */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Ids.fixedPointSum(col("value"), 2).as("sum_value"))
      .select(col("w.start").cast("long").as("window_start_s"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming face of [[slidingCounts]]: same aggregation under a
    * watermark (append-compatible; state = open windows per type only).
    */
  def streamingSlidingCounts(stream: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Ids.fixedPointSum(col("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** The BUILT-IN `session_window` face of sessionization — the same
    * gap semantics as [[sessionizeBatch]] expressed as a session-window
    * aggregation instead of a lag/running-sum window chain: one hash
    * aggregation with map-side session merging, no per-user sort. Its
    * boundary convention is half-open ([start, last + gap)): an event
    * arriving at EXACTLY gap after the previous one starts a NEW
    * session, where the gaps-and-islands face keeps it (diff > gap
    * splits there) — the two faces are distinct queries for that
    * reason, each with its own oracle. Emits microsecond bounds
    * (session_end_us = last event, i.e. window end minus the gap).
    */
  def sessionWindowCounts(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), Ids.fixedPointSum(col("value"), 2).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        (unix_micros(col("sw.end")) - lit(gapMinutes * 60L * 1000000L)).as("session_end_us"),
        col("n_events"), col("sum_value"))

  /** Streaming face of [[sessionWindowCounts]]: the identical
    * aggregation under a watermark — Spark's native streaming session
    * windows (state merges sessions as late-but-in-horizon events
    * arrive; the watermark bounds state and emission).
    */
  def streamingSessionWindowCounts(stream: DataFrame, gapMinutes: Int = 30,
      watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), Ids.fixedPointSum(col("value"), 2).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        (unix_micros(col("sw.end")) - lit(gapMinutes * 60L * 1000000L)).as("session_end_us"),
        col("n_events"), col("sum_value"))

  /** Batch sessionization: per user, a new session starts when the gap
    * to the previous event exceeds `gapMinutes` (gaps-and-islands on
    * time — the same W2/W3 shape as the coverage pipeline).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts").cast("long")).as("session_start_s"),
        max(col("ts").cast("long")).as("session_end_s"),
        count(lit(1)).as("n_events"), Ids.fixedPointSum(col("value"), 2).as("sum_value"))
  }

  /** Streaming exact dedup: drop rows whose key was already seen within
    * the watermark horizon — state stays bounded by the watermark, the
    * streaming face of the batch exact-dedup operator (graft.dedup).
    */
  def streamingDedup(stream: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    stream.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Batch face of the event-time interval join: each left row paired
    * with same-key right rows at most `maxDelaySeconds` BEFORE it
    * (r.ts ∈ [l.ts − delay, l.ts] — the "view within N seconds before
    * the click" enrichment shape). Right columns come back `r_`-prefixed
    * (minus the joined key). Plans as a hash equi-join on the key with
    * the range as a residual filter — never a cartesian.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      timeCol: String, maxDelaySeconds: Long): DataFrame = {
    val r2 = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    left.join(r2,
        col(key) === col(s"r_$key") &&
          col(s"r_$timeCol") >= col(timeCol) - expr(s"INTERVAL $maxDelaySeconds SECONDS") &&
          col(s"r_$timeCol") <= col(timeCol))
      .drop(s"r_$key")
  }

  /** Streaming face of [[intervalJoin]]: the same key + time-range
    * condition as a watermarked STREAM-STREAM inner join. The range
    * condition is load-bearing for state cleanup — it tells the engine
    * how long each side's rows can still match, so buffered state is
    * bounded by watermark + delay instead of growing forever.
    */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame, key: String,
      timeCol: String, maxDelaySeconds: Long,
      watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(timeCol, watermark)
    val r2 = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$timeCol", watermark)
    l.join(r2,
        col(key) === col(s"r_$key") &&
          col(s"r_$timeCol") >= col(timeCol) - expr(s"INTERVAL $maxDelaySeconds SECONDS") &&
          col(s"r_$timeCol") <= col(timeCol))
      .drop(s"r_$key")
  }

  /** Ordered-funnel analysis: per user, the earliest completion of the
    * `steps` chain (step i+1 is the FIRST matching event at-or-after
    * the user's step-i time, within `horizonSeconds` of it). Returns
    * one row per user who reached step 1, with each reached step's
    * epoch-second time (later steps null once the chain breaks) and the
    * 1-based `stage` reached — the conversion-analysis shape (how far
    * did each user get, and when).
    *
    * Earliest-first semantics make the result deterministic and
    * oracle-expressible: min(t1) is unique, then min(t2 | t2 ∈ [t1,
    * t1+h]) is unique, and so on. Each stage is one partial-aggregated
    * groupBy on user_id plus a user_id equi-join — at scale the stages
    * co-partition on the same key, and no stage ever shuffles event
    * payloads, only (user, ts) pairs.
    */
  def funnel(events: DataFrame, steps: Seq[String] = Seq("view", "click", "purchase"),
      horizonSeconds: Long = 7L * 24 * 3600): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.where(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val staged = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val next = events.where(col("event_type") === step)
        .select(col("user_id"), col("ts"))
        .join(acc.select(col("user_id"), col(prev)), Seq("user_id"))
        .where(col("ts").cast("long") >= col(prev).cast("long") &&
          col("ts").cast("long") <= col(prev).cast("long") + horizonSeconds)
        .groupBy(col("user_id")).agg(min(col("ts")).as(cur))
      acc.join(next, Seq("user_id"), "left")
    }
    val stageCols = steps.indices.map(i => col(s"t${i + 1}"))
    staged.select(
      col("user_id") +:
        stageCols.zipWithIndex.map { case (c, i) => c.cast("long").as(s"t${i + 1}_s") } :+
        stageCols.map(c => when(c.isNotNull, 1L).otherwise(0L))
          .reduce(_ + _).as("stage"): _*)
  }

  /** Trailing time-range rolling features: for every event, the count
    * and (fixed-point) value sum of the SAME user's events in the
    * trailing `windowSeconds` — a RANGE-frame window on epoch seconds,
    * the per-entity velocity/feature shape (events-per-hour, spend in
    * the last hour) that tumbling windows cannot express because the
    * frame follows each row.
    *
    * RANGE (not ROWS) makes tied timestamps peers on both engines, so
    * the result is order-independent and exactly reproducible. One
    * shuffle on user_id; the frame is evaluated with a sliding two-
    * pointer pass over each user's sorted run, not a per-row rescan.
    */
  def rollingCounts(events: DataFrame, windowSeconds: Long = 3600L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").cast("long"))
      .rangeBetween(-windowSeconds, 0)
    events.select(col("event_id"), col("user_id"),
      col("ts").cast("long").as("ts_s"),
      count(lit(1)).over(w).as("n_trailing"),
      sum(floor(col("value") * 100.0).cast("long")).over(w).as("sum_value_c"))
  }

  /** Windowed trending top-k: the k most frequent event types per
    * tumbling window, rank-stamped — "what is trending this hour". The
    * rank filter (`row_number <= k`) plans a map-side partial
    * WindowGroupLimit (plan-gated), so a hot window never sorts its
    * full type distribution on one reducer; counts underneath are the
    * same partial-aggregated tumbling shape as [[tumblingCounts]].
    * Streaming composition: run [[streamingTumblingCounts]] and apply
    * this rank inside foreachBatch — windows-over-aggregates do not
    * stream in append mode.
    */
  def trendingTopK(events: DataFrame, width: String = "1 hour",
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w")).orderBy(col("n_events").desc, col("event_type"))
    counts.withColumn("rank", row_number().over(rw).cast("long"))
      .where(col("rank") <= k)
      .select(col("w.start").cast("long").as("window_start_s"),
        col("event_type"), col("n_events"), col("rank"))
  }

  /** Rolling z-score anomaly detection in EXACT integer arithmetic —
    * the outlier flag a metrics pipeline raises per event against the
    * user's own trailing history. Values enter as cent fixed-point
    * (floor(value·100)); the trailing window (previous `lag` events,
    * current row EXCLUDED — a spike must not mask itself) carries
    * integer (n, Σx, Σx²), and the flag is the cross-multiplied form of
    * |x−μ| > k·σ:
    *   (x·n − Σx)² > k² · (n·Σx² − (Σx)²)
    * — z-score squared with every division cleared, so no IEEE rounding
    * decides a flag on either engine. Events with fewer than `minN`
    * predecessors report null (no baseline, not "normal").
    *
    * Scale shape: one exchange + sort on user_id serves all three
    * window sums; everything after is a map-only integer expression.
    * Overflow headroom: |x| ≤ 10^6 cents and lag ≤ 10^3 keeps every
    * term under 2^62.
    */
  def rollingZScore(events: DataFrame, lag: Int = 16, k: Int = 3,
      minN: Int = 8): DataFrame = {
    require(lag >= 2 && minN >= 2 && minN <= lag && k >= 1,
      s"need 2 <= minN <= lag and k >= 1, got lag=$lag minN=$minN k=$k")
    val x = floor(col("value") * 100.0).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-lag, -1)
    val dev = col("x") * col("n") - col("s1")
    val varN2 = col("n") * col("s2") - col("s1") * col("s1")
    events.select(col("event_id"), col("user_id"), col("ts"),
        col("ts").cast("long").as("ts_s"), x.as("x"))
      .withColumn("n", count(col("x")).over(w))
      .withColumn("s1", sum(col("x")).over(w))
      .withColumn("s2", sum(col("x") * col("x")).over(w))
      .withColumn("is_anomaly",
        when(col("n") < minN, lit(null).cast("boolean"))
          .otherwise(dev * dev > lit(k.toLong * k) * varN2))
      .drop("ts")
  }

  /** First-order Markov transition matrix over per-user event-type
    * sequences — the sequence-modeling prep step (next-event
    * prediction, funnel leak analysis): count (prev_type → type)
    * adjacencies along each user's timeline, then per-row transition
    * probabilities in exact fixed point (subtract-remainder division:
    * floor(10^6·cnt / total) with no IEEE rounding). Each user's first
    * event has no predecessor and is excluded.
    *
    * Scale shape: one exchange + sort on user_id for the lag, one
    * partial-aggregated groupBy on the (prev, cur) pair grid (|types|²
    * — bounded), row totals attach by a |types|-row broadcast.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_type").as("cur"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .where(col("prev").isNotNull)
    val counts = pairs.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("prev").agg(sum("cnt").as("total"))
    val scaled = col("cnt") * 1000000L
    counts.join(broadcast(totals), Seq("prev"))
      .select(col("prev"), col("cur"), col("cnt"), col("total"),
        ((scaled - pmod(scaled, col("total"))) / col("total"))
          .cast("long").as("p_ppm"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Internal row of the unioned as-of input: side 0 = reference
    * (right), side 1 = probe (left) — same tag convention as the batch
    * face in [[graft.operators.AsOf]].
    */
  case class AsOfTagged(side: Int, event_id: Long, ts: Timestamp,
      user_id: Long, value: Double)

  /** Per-key as-of state: buffered reference rows and probe rows not
    * yet releasable — both watermark-bounded (see [[streamingAsOf]]).
    * Tuples are (epochMs, event_id, value).
    */
  case class AsOfBuffer(rights: Seq[(Long, Long, Double)],
      lefts: Seq[(Long, Long, Double)])

  /** One emitted as-of match: the probe row plus the latest reference
    * row at-or-before it (None = no reference row preceded the probe,
    * the streaming twin of the batch face's null columns).
    */
  case class AsOfJoined(user_id: Long, event_id: Long, ts: Timestamp,
      value: Double, r_event_id: Option[Long], r_ts: Option[Timestamp],
      r_value: Option[Double])

  /** Stream-stream as-of join — the streaming face of
    * [[graft.operators.AsOf.asOfJoin]], via the union +
    * flatMapGroupsWithState formulation: tag both streams, union under
    * one watermark, group by key, and hold each probe row until the
    * watermark passes its event time. At that point EVERY reference row
    * at-or-before the probe has arrived (the watermark guarantee), so
    * the match — latest reference with r.ts <= probe.ts, ties inclusive
    * like the batch face — is exact, not best-effort.
    *
    * State is bounded per key: probe rows leave when the watermark
    * passes them (an event-time timeout fires even on an idle key), and
    * of the reference rows at-or-before the watermark only the LATEST
    * one is kept (it is the only one any future probe can still match —
    * unbounded lookback semantics with O(watermark horizon) state).
    */
  def streamingAsOf(left: Dataset[Event], right: Dataset[Event],
      watermark: String = "1 hour")(implicit spark: SparkSession): Dataset[AsOfJoined] = {
    import spark.implicits._
    // watermark EACH stream before the union (same as
    // streamingIntervalJoin): the global watermark is then the MIN of
    // the two streams, so a fast probe stream cannot advance it past a
    // lagging reference stream and get reference rows dropped as late —
    // a post-union watermark would silently turn matches into Nones
    val tagged = left
      .map(e => AsOfTagged(1, e.event_id, e.ts, e.user_id, e.value))
      .withWatermark("ts", watermark)
      .unionByName(right.map(e => AsOfTagged(0, e.event_id, e.ts, e.user_id, e.value))
        .withWatermark("ts", watermark))
    tagged.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfBuffer, AsOfJoined](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state: GroupState[AsOfBuffer]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(AsOfBuffer(Seq.empty, Seq.empty))
          // accumulate into buffers and build the state object ONCE — a
          // per-row immutable :+ plus case-class copy is O(batch²) on a
          // hot key
          val rBuf = scala.collection.mutable.ArrayBuffer.from(prev.rights)
          val lBuf = scala.collection.mutable.ArrayBuffer.from(prev.lefts)
          rows.foreach { t =>
            val row = (t.ts.getTime, t.event_id, t.value)
            if (t.side == 0) rBuf += row else lBuf += row
          }
          val st = AsOfBuffer(rBuf.toSeq, lBuf.toSeq)
          // release probes the watermark has passed; the rest wait
          val (ready, pending) = st.lefts.partition(_._1 <= wm)
          val rightsSorted = st.rights.sortBy(r => (r._1, r._2))
          val out = ready.sortBy(l => (l._1, l._2)).map { case (lts, lid, lval) =>
            val m = rightsSorted.takeWhile(_._1 <= lts).lastOption
            AsOfJoined(userId, lid, new Timestamp(lts), lval,
              m.map(_._2), m.map(r => new Timestamp(r._1)), m.map(_._3))
          }
          // keep reference rows still ahead of the watermark, plus the
          // single latest one at-or-before it
          val (past, fresh) = rightsSorted.partition(_._1 <= wm)
          val kept = past.takeRight(1) ++ fresh
          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(AsOfBuffer(kept, pending))
            // wake this key when the watermark passes its oldest
            // pending probe, even if no further data arrives for it
            if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_._1).min)
          }
          out.iterator
      }
  }
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Streaming sessionization: custom per-key state via
    * flatMapGroupsWithState with event-time timeout — emits a session
    * when the watermark passes its gap horizon.
    */
  def streamingSessionize(stream: Dataset[Event], gapMinutes: Int = 30)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    stream
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, events, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Cohort retention: bucket every event into fixed UTC epochs (weeks
    * by default), assign each user to the cohort of their FIRST bucket,
    * and count per (cohort, bucket-offset) the distinct users still
    * active and their events — the standard product-analytics retention
    * triangle, and for a training-data pipeline the contributor-churn
    * view of a streaming corpus.
    *
    * Scale shape: first-bucket is one partial-aggregated min per user;
    * the join back is user_id-keyed on both sides (no broadcast needed,
    * |users| is unbounded); the final distinct-count aggregates on
    * (cohort, offset) — a bounded grid (weeks × weeks). Epoch-quotient
    * bucketing (integer `div`) keeps both engines exact.
    */
  def cohortRetention(events: DataFrame,
      bucketSeconds: Long = 604800L): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive")
    // exact integer division: (a - a%b)/b has an exactly-divisible
    // numerator, so the double quotient is exact — a bare a/b can
    // round UP across an integer boundary (b is not a power of two)
    // and then truncate to the wrong bucket
    val tsl = col("ts").cast("long")
    val e = events.select(col("user_id"),
      ((tsl - pmod(tsl, lit(bucketSeconds))) / bucketSeconds)
        .cast("long").as("bucket"))
    val firsts = e.groupBy("user_id").agg(min("bucket").as("cohort"))
    e.join(firsts, Seq("user_id"))
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
  }

  /** Last-touch attribution: each conversion event is credited to the
    * LATEST preceding touch event by the same user within `horizonS`
    * seconds — an as-of join ([[graft.operators.AsOf.asOfJoin]]) with a
    * horizon filter on top. If the latest preceding touch is outside
    * the horizon, every earlier one is too (they are older), so the
    * conversion is correctly unattributed (null touch columns) — the
    * post-join filter loses nothing.
    *
    * Scale shape: inherits the as-of join's single (user_id) exchange +
    * one ordered window pass; the horizon check is a map-only epoch
    * subtraction.
    */
  def lastTouchAttribution(events: DataFrame, convType: String = "purchase",
      touchType: String = "click", horizonS: Long = 3600L): DataFrame = {
    val conversions = events.where(col("event_type") === convType)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    // unique per (user, ts): on timestamp ties the as-of window's
    // last() is order-ambiguous among right rows, so collapse to the
    // max event_id first (the same guard the asof query faces use)
    val touches = events.where(col("event_type") === touchType)
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("touch_event_id"))
      .withColumn("touch_ts_s", col("ts").cast("long"))
    graft.operators.AsOf.asOfJoin(conversions, touches, Seq("user_id"),
        "ts", Seq("touch_event_id", "touch_ts_s"))
      .withColumn("latency_s", col("ts").cast("long") - col("touch_ts_s"))
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("conv_ts_s"), col("value"),
        when(col("latency_s") <= horizonS, col("touch_event_id")).as("touch_event_id"),
        when(col("latency_s") <= horizonS, col("latency_s")).as("latency_s"))
  }

  /** Per-key session processor for [[streamingSessionizeTws]] — the
    * Spark 4 `transformWithState` formulation of the exact logic in
    * [[streamingSessionize]]'s flatMapGroupsWithState closure: merge
    * in-gap events into the open session, close it on a gap, and let an
    * event-time TIMER (the arbitrary-timer generalization of
    * GroupStateTimeout) flush the open session once the watermark
    * passes last + gap. Timers are re-registered per update and the
    * stale one deleted — transformWithState allows many timers per key,
    * so an unremoved stale timer would double-emit.
    */
  private class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, Session] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val prevState = if (state.exists()) Some(state.get()) else None
      var cur = prevState
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs =>
            cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += Session(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.sum)
            cur = Some(SessionState(t, t, 1L, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1L, e.value))
        }
      }
      cur.foreach { s =>
        prevState.foreach(p => getHandle.deleteTimer(p.last + gapMs))
        state.update(s)
        getHandle.registerTimer(s.last + gapMs)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Session] =
      (if (state.exists()) Some(state.get()) else None) match {
        // guard: only flush if THIS timer is the session's live horizon
        // (a racing update re-registered a later one)
        case Some(s) if expired.getExpiryTimeInMs() >= s.last + gapMs =>
          state.clear()
          Iterator(Session(userId, new Timestamp(s.start),
            new Timestamp(s.last), s.n, s.sum))
        case _ => Iterator.empty
      }
  }

  /** Per-bucket Bloom state for [[streamingBloomDedup]]: the bucket's
    * filter as one Long array in a ValueState. Mirrors
    * [[graft.sketch.Sketches]]' iterated mid-square double hashing on
    * the JVM side (same constants), so a persisted batch bloom and the
    * streaming state agree bit-for-bit on what "seen" means.
    */
  private class BloomDedupProcessor(nWords: Int, k: Int)
      extends StatefulProcessor[Long, Event, Event] {
    @transient private var state: ValueState[Array[Long]] = _
    private val nBits = nWords.toLong * 63L

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Long]]("bloom",
        org.apache.spark.sql.Encoders.javaSerialization[Array[Long]],
        TTLConfig.NONE)

    private def slots(key: Long): Array[Long] = {
      val P = 2147483647L
      val x = ((key % P) + P) % P
      val h1a = (x * x + 12345L) % P
      val h1 = (h1a * h1a + 6789L) % P
      val h2a = ((x + 40503L) * (x + 99991L)) % P
      val h2 = (h2a * h2a + 987654321L) % P
      Array.tabulate(k)(i => (h1 + i.toLong * h2) % nBits)
    }

    override def handleInputRows(bucket: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Event] = {
      val words = if (state.exists()) state.get() else new Array[Long](nWords)
      var dirty = false
      // deterministic intra-batch order, so replays emit the same
      // representative of an intra-batch duplicate pair
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).filter { e =>
        val ss = slots(e.event_id)
        val fresh = ss.exists(p => (words((p / 63L).toInt) >>> (p % 63L).toInt & 1L) == 0L)
        if (fresh) {
          ss.foreach(p => words((p / 63L).toInt) |= 1L << (p % 63L).toInt)
          dirty = true
        }
        fresh
      }
      if (dirty) state.update(words)
      out.iterator
    }

    override def handleExpiredTimer(bucket: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Event] =
      Iterator.empty
  }

  /** Streaming APPROXIMATE dedup with BOUNDED state — the shape
    * [[streamingDedup]] cannot reach: dropDuplicatesWithinWatermark
    * stores one state row per key, so "dedup event ids forever" grows
    * state with the key count; at corpus scale that is unbounded. Here
    * the key space hashes into `nBuckets` Bloom filters of `nWords`
    * 63-bit words each — state is nBuckets·nWords·8 bytes, FOREVER,
    * regardless of how many keys flow through.
    *
    * The trade is explicit and one-sided: a true duplicate is ALWAYS
    * dropped (no false negatives in the filter ⇒ no duplicate ever
    * emitted — the guarantee dedup consumers rely on), while a novel
    * key can be falsely dropped at the standard (1−e^(−kn/m))^k rate
    * as buckets fill. Size nWords for the expected key volume, or
    * rotate buckets by re-keying with an epoch when loss budgets reset.
    * StreamingSpec pins both sides of the contract.
    */
  def streamingBloomDedup(stream: Dataset[Event], nBuckets: Int = 64,
      nWords: Int = 256, k: Int = 4)(
      implicit spark: SparkSession): Dataset[Event] = {
    import spark.implicits._
    stream
      .groupByKey(e => ((e.event_id % nBuckets) + nBuckets) % nBuckets)
      .transformWithState(new BloomDedupProcessor(nWords, k),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming sessionization on the Spark 4 `transformWithState` API —
    * the third face of the session operator (batch islands /
    * flatMapGroupsWithState / StatefulProcessor). Same emission
    * contract as [[streamingSessionize]]; spec-tested equal. Runs on
    * the RocksDB state store (the API requires it), which is also the
    * right provider at 100 TB state sizes — changelog checkpointing,
    * no JVM-heap state.
    */
  def streamingSessionizeTws(stream: Dataset[Event], gapMinutes: Int = 30)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    stream
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** DAU / trailing-WAU stickiness — the engagement ratio product
    * analytics watches daily: for each day, distinct active users that
    * day over distinct users across the trailing 7 days,
    * stickiness_ppm = dau·1e6 div wau. EXACT sliding distincts without
    * a sliding window state: each (user, day) activity row supports
    * the 7 daily windows ending on day..day+6, so one constant ×7
    * explode + two distinct counts do it — linear in user-days, no
    * per-day rescan, no approximate sketch (swap in HLL when user-days
    * stop fitting the shuffle).
    *
    * Days with trailing activity but no same-day activity still row
    * (dau 0); the first 6 days count truncated windows (the standard
    * dashboard convention — the window clips at series start). Window
    * days PAST the last active day are not emitted (they would be
    * pure-trailing ghosts).
    *
    * @return (day, dau, wau, stickiness_ppm)
    */
  def stickiness(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val tsl = col("ts").cast("long")
    val ud = events.select(col("user_id"),
        ((tsl - pmod(tsl, lit(86400L))) / 86400L).cast("long").as("day"))
      .distinct()
    val maxDay = ud.agg(max(col("day")).as("max_day"))
    val dau = ud.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + (windowDays - 1)))
          .as("day"))
      .crossJoin(broadcast(maxDay))
      .where(col("day") <= col("max_day"))
      .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
    wau.join(dau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
        expr("(coalesce(dau, 0L) * 1000000L) div wau").as("stickiness_ppm"))
  }

  /** Seasonal-naive backtest — the forecasting baseline every anomaly
    * monitor must beat before it earns its keep: predict each day's
    * per-type cent total with the value `lagDays` OBSERVED days back
    * (one weekly season at the default 7; the lag runs over the
    * observed-day series — calendar gaps compress, the standard
    * dense-daily contract) and report the exact integer MAE. A model
    * whose error isn't under this number is worse than "same as last
    * week".
    *
    * Scale shape: one (type, day)-keyed partial-agged daily sum, a lag
    * window over the day series per type, one |types|-row aggregate.
    *
    * @return (event_type, n_scored, sum_abs_err, mae_cents)
    */
  def seasonalNaiveBacktest(events: DataFrame, lagDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lagDays > 0, s"lagDays must be positive, got $lagDays")
    val tsl = col("ts").cast("long")
    val daily = events.select(col("event_type"),
        ((tsl - pmod(tsl, lit(86400L))) / 86400L).cast("long").as("day"),
        floor(col("value") * 100.0).cast("long").as("cents"))
      .groupBy("event_type", "day").agg(sum(col("cents")).as("s"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily.select(col("event_type"), col("s"),
        lag(col("s"), lagDays).over(w).as("pred"))
      .where(col("pred").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col("s") - col("pred"))).as("sum_abs_err"))
      .select(col("event_type"), col("n_scored"), col("sum_abs_err"),
        expr("sum_abs_err div n_scored").as("mae_cents"))
  }

  /** CUSUM change-point detection per event type — "on which day did
    * this metric's level shift": the day whose cumulative-sum deviation
    * from the proportional ramp is largest,
    *   stat(d) = |C_d·n − T·d|
    * over the type's day series (C_d = running cent-value sum through
    * the d-th observed day, T = series total, n = day count). The
    * cross-multiplied form keeps the classic |C_d − (d/n)·T| criterion
    * in EXACT integer arithmetic — no division anywhere — and scales
    * both sides by n, which is rank-preserving per type. Ties break to
    * the earliest day (the first moment the evidence peaks).
    *
    * Scale shape: one (type, day)-keyed partial-agged daily sum, then
    * windows over the DAY SERIES (≤ series length per type, never per
    * event) partitioned by type, and a per-type max-struct argmax — one
    * aggregation, no self-join, no global sort. Headroom: C_d·n needs
    * total cents × days < 2⁶³ (~9e18) — beyond any single metric
    * series; the day index is the 1-based observed-day rank, so gaps
    * in the calendar don't skew the ramp.
    *
    * @return (event_type, cp_day, cusum_stat, n_days) — cp_day is the
    *         epoch-day bucket where the shift evidence peaks
    */
  def changePoints(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col("event_type"), col("ts").cast("long").as("tsl"),
        floor(col("value") * 100.0).cast("long").as("cents"))
      .select(col("event_type"),
        ((col("tsl") - pmod(col("tsl"), lit(86400L))) / 86400L)
          .cast("long").as("day"), col("cents"))
      .groupBy("event_type", "day")
      .agg(sum(col("cents")).as("s"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val cum = daily.select(col("event_type"), col("day"),
      sum(col("s")).over(w).as("c"),
      row_number().over(w).cast("long").as("d_idx"))
    val totals = daily.groupBy("event_type")
      .agg(sum(col("s")).as("t"), count(lit(1)).as("n_days"))
    cum.join(totals, Seq("event_type"))
      .select(col("event_type"), col("day"), col("n_days"),
        abs(col("c") * col("n_days") - col("t") * col("d_idx")).as("stat"))
      .groupBy("event_type")
      .agg(max(struct(col("stat"), (-col("day")).as("neg_day"),
        col("n_days"))).as("m"))
      .select(col("event_type"), (-col("m.neg_day")).as("cp_day"),
        col("m.stat").as("cusum_stat"), col("m.n_days").as("n_days"))
  }
}

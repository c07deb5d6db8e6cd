package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, OSql, Q, Tables}

/** Event-time operators: the batch twins of the replay tool's streaming
  * semantics (SURVEY.md §2.2 "streaming-semantics"). Each query is the
  * deterministic batch statement of what the Structured Streaming
  * pipeline in graft.streaming computes incrementally — DuckDB can
  * verify these, while the true readStream path is verified against
  * these twins (prefix-consistency, SURVEY.md §5.2).
  *
  * All time arithmetic is in epoch-milliseconds (see Windows.scala note
  * on the ns-parquet / µs-Spark truncation).
  */
object EventTime {
  import Det._

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** Tumbling 1-hour window × event_type — the streaming groupBy(window)
    * twin. Emits the window start as epoch seconds.
    */
  private val tumbling = Q(
    "stream_tumbling",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window(timestamp_millis($"ms"), "1 hour"), $"event_type")
        .agg(count(lit(1)).as("cnt"), moneySum($"value").as("total_value"))
        .select(unix_timestamp($"window.start").as("hour_start"),
          $"event_type", $"cnt", $"total_value")
        .orderBy("hour_start", "event_type")
    },
    Some("SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start, " +
      "event_type, count(*) AS cnt, " + OSql.msum("value") + " AS total_value " +
      "FROM events GROUP BY 1, 2 ORDER BY 1, 2"))

  /** Sessionization with a 30-minute gap: lag → new-session flag →
    * running sum = session id → two-level aggregate. Batch twin of
    * session_window(ts, '30 minutes').
    */
  private val session = Q(
    "stream_session",
    (s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ms".asc, $"event_id".asc)
      val events = Tables.events(s, d)
        .select($"user_id", $"event_id", $"ms")
      val flagged = events.withColumn("is_new",
        when(lag($"ms", 1).over(byUser).isNull ||
          $"ms" - lag($"ms", 1).over(byUser) > 1800000L, 1L).otherwise(0L))
      val sessions = flagged.withColumn("sess",
        sum($"is_new").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val perSession = sessions.groupBy($"user_id", $"sess")
        .agg(min($"ms").as("t0"), max($"ms").as("t1"), count(lit(1)).as("n"))
      perSession.groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum($"n").cast("long").as("n_events"),
          dround(avg(($"t1" - $"t0").cast("double")), 2).as("avg_session_ms"))
        .orderBy("user_id")
    },
    Some("WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events), " +
      "f AS (SELECT user_id, event_id, ms, CASE WHEN lag(ms) OVER w IS NULL OR " +
      "ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new FROM e " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ms ASC, event_id ASC)), " +
      "s AS (SELECT user_id, ms, SUM(is_new) OVER (PARTITION BY user_id " +
      "ORDER BY ms ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM f), " +
      "p AS (SELECT user_id, sess, min(ms) AS t0, max(ms) AS t1, count(*) AS n FROM s GROUP BY 1, 2) " +
      "SELECT user_id, count(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events, " +
      OSql.sround("AVG(CAST(t1 - t0 AS DOUBLE))", 2) + " AS avg_session_ms " +
      "FROM p GROUP BY 1 ORDER BY 1"))

  /** Spark's NATIVE session_window primitive — the idiomatic
    * sessionization operator (vs stream_session's portable lag+cumsum
    * spelling of the same semantics). Emits one row per (user, session):
    * start = first event, end = last event + gap, exactly Spark's
    * session-window bounds. Boundary semantics pinned by the oracle: a
    * gap of EXACTLY 30 minutes starts a NEW session (session_window
    * merges only strictly-overlapping [t, t+gap) intervals), so the
    * oracle's new-session flag is `>=` where stream_session's is `>`
    * (the engines agree; SessionTwinSpec pins the reconstruction).
    * Scale: one shuffle on user_id, sessions merged within partitions —
    * same cost envelope as the window spelling; in a streaming context
    * this operator carries per-key open-session state bounded by the
    * watermark.
    */
  private val sessionWindowNative = Q(
    "stream_session_window",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id", session_window(timestamp_millis($"ms"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), moneySum($"value").as("total_value"))
        .select($"user_id", unix_millis($"sw.start").as("start_ms"),
          unix_millis($"sw.end").as("end_ms"), $"n_events", $"total_value")
        .orderBy("user_id", "start_ms")
    },
    Some("WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events), " +
      "f AS (SELECT user_id, event_id, ms, value, CASE WHEN lag(ms) OVER w IS NULL OR " +
      "ms - lag(ms) OVER w >= 1800000 THEN 1 ELSE 0 END AS is_new FROM e " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ms ASC, event_id ASC)), " +
      "s AS (SELECT user_id, ms, value, SUM(is_new) OVER (PARTITION BY user_id " +
      "ORDER BY ms ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM f) " +
      "SELECT user_id, min(ms) AS start_ms, max(ms) + 1800000 AS end_ms, " +
      "count(*) AS n_events, " + OSql.msum("value") + " AS total_value " +
      "FROM s GROUP BY user_id, sess ORDER BY user_id, start_ms"))

  /** dropDuplicates twin: first event per (user_id, event_type) in event
    * time — row_number over the watermark ordering.
    */
  private val dedup = Q(
    "stream_dedup",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ms".asc, $"event_id".asc)
      Tables.events(s, d)
        .select($"user_id", $"event_type", $"event_id", $"ms")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    },
    Some("SELECT user_id, event_type, event_id FROM " +
      "(SELECT user_id, event_type, event_id, row_number() OVER " +
      "(PARTITION BY user_id, event_type ORDER BY epoch_ms(ts) ASC, event_id ASC) AS rn " +
      "FROM events) WHERE rn = 1 ORDER BY user_id, event_type"))

  /** Watermark model: what a 1-hour watermark would drop — rows older
    * than max(event time) - 1h, counted per type. Scalar-subquery max is
    * a single-row broadcast in Spark.
    *
    * Measured nuance (Spark 4.1, probed live in round 6): a streaming
    * AGGREGATION only drops a late row once the row's window state has
    * been EVICTED (watermark passed the window end after a batch) — a
    * late row arriving for a window that never had state is still
    * accepted and finalized. This model is therefore the steady-state
    * bound (what a long-running stream sheds); the operators whose input
    * filter drops strictly below the watermark — dedup
    * (`stream_dedup_watermark`) and event-time-timeout state
    * (`stream_session_eventtime`) — are exercised live in
    * ReplayTwinSpec.
    */
  private val lateData = Q(
    "stream_late_data",
    (s, d) => {
      import s.implicits._
      val maxMs = Tables.events(s, d).agg(max($"ms").as("max_ms"))
      Tables.events(s, d)
        .select($"event_type", $"ms")
        .crossJoin(broadcast(maxMs))
        .filter($"ms" < $"max_ms" - 3600000L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("late_cnt"))
        .orderBy("event_type")
    },
    Some("SELECT event_type, count(*) AS late_cnt FROM events " +
      "WHERE epoch_ms(ts) < (SELECT max(epoch_ms(ts)) FROM events) - 3600000 " +
      "GROUP BY 1 ORDER BY 1"))

  /** Sliding windows (1 h length, 15 min slide): each event lands in
    * exactly 4 windows (3600/900). Spark's window() aligns slides to the
    * epoch, so the oracle enumerates the 4 starts arithmetically.
    */
  private val sliding = Q(
    "stream_sliding",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window(timestamp_millis($"ms"), "1 hour", "15 minutes"), $"event_type")
        .agg(count(lit(1)).as("cnt"))
        .select(unix_timestamp($"window.start").as("win_start"), $"event_type", $"cnt")
        .orderBy("win_start", "event_type")
    },
    Some("WITH e AS (SELECT epoch_ms(ts)//1000 AS t, event_type FROM events), " +
      "k AS (SELECT unnest([0,1,2,3]) AS k) " +
      // FLOOR-aligned window starts (t − posmod(t, 900)), not the //
      // truncation, which diverges from Spark's TimeWindow on
      // pre-epoch (negative) event times
      "SELECT CAST((t - ((t % 900) + 900) % 900) - k * 900 AS BIGINT) AS win_start, " +
      "event_type, count(*) AS cnt " +
      "FROM e CROSS JOIN k GROUP BY 1, 2 ORDER BY 1, 2"))

  /** As-of (point-in-time) join: for every event, the most recent
    * STRICTLY-earlier signup of the same user. In Spark this is not a
    * join at all: a max-over-range-frame window (shuffle once on
    * user_id) — the plan a 1000-executor cluster wants, vs. the
    * O(n·log n)-per-key merge an ASOF JOIN implies. The oracle uses
    * DuckDB's native ASOF LEFT JOIN with a strict `>` bound, which has
    * identical semantics to the rangeBetween(-∞, -1) frame.
    */
  private val asof = Q(
    "join_asof",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms".asc)
        .rangeBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select($"event_id", $"user_id", $"event_type", $"ms")
        .withColumn("prev_signup_ms",
          max(when($"event_type" === "signup", $"ms")).over(w))
        .select($"event_id", $"user_id", $"ms", $"prev_signup_ms")
        .orderBy("event_id")
    },
    Some("WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events), " +
      "s AS (SELECT user_id, epoch_ms(ts) AS ms FROM events WHERE event_type = 'signup') " +
      "SELECT e.event_id, e.user_id, e.ms, s.ms AS prev_signup_ms " +
      "FROM e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ms > s.ms " +
      "ORDER BY e.event_id"))

  /** As-of join with a MATCH TOLERANCE — the telemetry-alignment
    * variant: a prior signup only counts if it happened within the
    * last hour, else the event is UNMATCHED (null) — stale context
    * must not attach. Same single-exchange window spelling as
    * [[asof]] (one shuffle on user_id, one frame), plus one exact
    * integer comparison; the oracle restates the identical window +
    * CASE, so the tolerance boundary (gap exactly 3 600 000 ms
    * matches; one more fails) is hash-pinned.
    */
  private val asofTolerance = Q(
    "join_asof_tolerance",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms".asc)
        .rangeBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select($"event_id", $"user_id", $"event_type", $"ms")
        .withColumn("prev_ms",
          max(when($"event_type" === "signup", $"ms")).over(w))
        .withColumn("matched_signup_ms",
          when($"ms" - $"prev_ms" <= 3600000L, $"prev_ms"))
        .select($"event_id", $"user_id", $"ms", $"matched_signup_ms",
          ($"ms" - $"matched_signup_ms").as("gap_ms"))
        .orderBy("event_id")
    },
    Some("WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms " +
      "FROM events), " +
      "w AS (SELECT event_id, user_id, ms, " +
      "max(CASE WHEN event_type = 'signup' THEN ms END) OVER " +
      "(PARTITION BY user_id ORDER BY ms " +
      "RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_ms FROM e) " +
      "SELECT event_id, user_id, ms, " +
      "CASE WHEN ms - prev_ms <= 3600000 THEN prev_ms END AS matched_signup_ms, " +
      "ms - (CASE WHEN ms - prev_ms <= 3600000 THEN prev_ms END) AS gap_ms " +
      "FROM w ORDER BY event_id"))

  /** NEAREST-in-time as-of join — the bidirectional sibling of
    * [[asof]]: for every event, the signup of the same user closest in
    * time (either direction; ties break to the earlier one — the
    * sensor-alignment semantics time-series tooling calls "nearest").
    * Still not a join: the previous-signup max and next-signup min are
    * two range frames over the SAME (user_id, ms) sort — Spark runs the
    * growing and shrinking frames as two window passes, but the second
    * reuses the first's partitioning AND sort order, so the whole
    * operator costs ONE shuffle and ONE sort (plan-pinned) — the same
    * single-exchange economics as the backward as-of, where a
    * nearest-merge join would pay a per-key two-sided scan. The pick is
    * exact integer arithmetic (ms − prev ≤ next − ms), so both engines
    * agree bit-for-bit. A signup row is its own nearest signup
    * (distance 0) — declared semantics, identical in the oracle.
    */
  private val asofNearest = Q(
    "join_asof_nearest",
    (s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ms".asc)
      val wPrev = byUser.rangeBetween(Window.unboundedPreceding, 0)
      val wNext = byUser.rangeBetween(0, Window.unboundedFollowing)
      Tables.events(s, d)
        .select($"event_id", $"user_id", $"event_type", $"ms")
        .withColumn("prev_ms", max(when($"event_type" === "signup", $"ms")).over(wPrev))
        .withColumn("next_ms", min(when($"event_type" === "signup", $"ms")).over(wNext))
        .withColumn("nearest_signup_ms",
          when($"prev_ms".isNull, $"next_ms")
            .when($"next_ms".isNull, $"prev_ms")
            .when($"ms" - $"prev_ms" <= $"next_ms" - $"ms", $"prev_ms")
            .otherwise($"next_ms"))
        .select($"event_id", $"user_id", $"ms", $"nearest_signup_ms",
          abs($"ms" - $"nearest_signup_ms").as("dist_ms"))
        .orderBy("event_id")
    },
    Some("WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms " +
      "FROM events), " +
      "w AS (SELECT event_id, user_id, ms, " +
      "max(CASE WHEN event_type = 'signup' THEN ms END) OVER " +
      "(PARTITION BY user_id ORDER BY ms RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ms, " +
      "min(CASE WHEN event_type = 'signup' THEN ms END) OVER " +
      "(PARTITION BY user_id ORDER BY ms RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ms " +
      "FROM e) " +
      "SELECT event_id, user_id, ms, " +
      "CASE WHEN prev_ms IS NULL THEN next_ms WHEN next_ms IS NULL THEN prev_ms " +
      "WHEN ms - prev_ms <= next_ms - ms THEN prev_ms ELSE next_ms END AS nearest_signup_ms, " +
      "abs(ms - (CASE WHEN prev_ms IS NULL THEN next_ms WHEN next_ms IS NULL THEN prev_ms " +
      "WHEN ms - prev_ms <= next_ms - ms THEN prev_ms ELSE next_ms END)) AS dist_ms " +
      "FROM w ORDER BY event_id"))

  /** Ordered funnel analysis (signup → click → purchase): per user, the
    * first signup, the first click within the HOUR after that signup,
    * and the first purchase within the hour after that click — the
    * standard min-timestamp-chain funnel with per-step conversion
    * windows, NOT a per-event sequence scan. Each
    * stage is one filtered per-user partial+final min-aggregate joined
    * to the previous stage's (user, ms) table, so three scans of the
    * (pre-filtered, pushed-down) event types and three user-keyed
    * shuffles of #users-sized tables — at 100 TB the event scans prune
    * by type at the source and the join tables are users, not events.
    * avg_funnel_ms averages the integer ms deltas of completing users
    * (exact integer sums in double range — order-independent).
    */
  private val funnelSteps = Q(
    "funnel_steps",
    (s, d) => {
      import s.implicits._
      val e = Tables.events(s, d).select($"user_id", $"event_type", $"ms")
      val s1 = e.filter($"event_type" === "signup")
        .groupBy("user_id").agg(min($"ms").as("s_ms"))
      val s2 = e.filter($"event_type" === "click").join(s1, "user_id")
        .filter($"ms" >= $"s_ms" && $"ms" <= $"s_ms" + 3600000L)
        .groupBy("user_id").agg(min($"ms").as("c_ms"), min($"s_ms").as("s_ms"))
      val s3 = e.filter($"event_type" === "purchase").join(s2, "user_id")
        .filter($"ms" >= $"c_ms" && $"ms" <= $"c_ms" + 3600000L)
        .groupBy("user_id").agg(min($"ms").as("p_ms"), min($"s_ms").as("s_ms"))
      e.select($"user_id").distinct()
        .join(s1.select($"user_id", lit(1).as("f1")), Seq("user_id"), "left")
        .join(s2.select($"user_id", lit(1).as("f2")), Seq("user_id"), "left")
        .join(s3.select($"user_id", $"p_ms", $"s_ms", lit(1).as("f3")), Seq("user_id"), "left")
        .select(
          (coalesce($"f1", lit(0)) + coalesce($"f2", lit(0)) + coalesce($"f3", lit(0)))
            .cast("long").as("stage"),
          ($"p_ms" - $"s_ms").as("funnel_ms"))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_users"),
          dround(sum($"funnel_ms").cast("double") / count($"funnel_ms"), 4)
            .as("avg_funnel_ms"))
        .orderBy("stage")
    },
    Some("WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events), " +
      "s1 AS (SELECT user_id, min(ms) AS s_ms FROM e WHERE event_type = 'signup' GROUP BY 1), " +
      "s2 AS (SELECT e.user_id, min(e.ms) AS c_ms, min(s_ms) AS s_ms FROM e " +
      "JOIN s1 ON e.user_id = s1.user_id AND e.ms >= s1.s_ms " +
      "AND e.ms <= s1.s_ms + 3600000 " +
      "WHERE event_type = 'click' GROUP BY 1), " +
      "s3 AS (SELECT e.user_id, min(e.ms) AS p_ms, min(s_ms) AS s_ms FROM e " +
      "JOIN s2 ON e.user_id = s2.user_id AND e.ms >= s2.c_ms " +
      "AND e.ms <= s2.c_ms + 3600000 " +
      "WHERE event_type = 'purchase' GROUP BY 1), " +
      "u AS (SELECT DISTINCT user_id FROM e), " +
      "st AS (SELECT u.user_id, " +
      "(CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END + " +
      "CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END + " +
      "CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END) AS stage, " +
      "s3.p_ms - s3.s_ms AS funnel_ms FROM u " +
      "LEFT JOIN s1 ON u.user_id = s1.user_id " +
      "LEFT JOIN s2 ON u.user_id = s2.user_id " +
      "LEFT JOIN s3 ON u.user_id = s3.user_id) " +
      "SELECT CAST(stage AS BIGINT) AS stage, count(*) AS n_users, " +
      OSql.sround("CAST(SUM(funnel_ms) AS DOUBLE) / count(funnel_ms)", 4) +
      " AS avg_funnel_ms FROM st GROUP BY 1 ORDER BY 1"))

  val qs: Seq[Q] =
    Seq(tumbling, session, sessionWindowNative, dedup, lateData, sliding, asof,
      asofNearest, asofTolerance, funnelSteps)
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.core.{Det, OSql, Q, TmpDirs}

/** Custom streaming state via `flatMapGroupsWithState` — the Spark
  * primitive for session semantics that windowed aggregation cannot
  * express (SURVEY §4: KeyValueGroupedDataset custom state).
  *
  * Per user (the group key) the state holds the open session plus
  * closed-session totals; each micro-batch folds its events in
  * event-time order into the state and emits the user's refreshed
  * summary (Update mode — the upsert shape a KV/serving sink consumes).
  * At 100 TB the state store shards by user across executors and each
  * group's state is O(1) — counts and the open-session triple — so
  * state size is #users, not #events.
  *
  * Ordering caveat (documented, inherent to this fold's single-open-
  * session state): events are sorted within each micro-batch, so results
  * are exact when a batch holds a user's full history or batches arrive
  * in event-time order; an out-of-order split needs the watermark +
  * event-time-timeout variant — which is implemented below as
  * `stream_session_eventtime` ([[foldGroupEt]]/[[runEventTime]]), whose
  * interval-set state is order-independent and watermark-bounded.
  * Verify/Bench stream the archive as one batch, making this query's
  * result deterministic and equal to the batch twin `stream_session` —
  * which is why both variants carry the SAME DuckDB oracle.
  */
object StatefulSessions {

  case class Ev(user_id: Long, event_id: Long, ms: Long)

  /** Open session (t0 = first ms, last = latest ms, n = events) plus
    * closed totals; `events` counts everything ever seen for the user.
    */
  case class SessState(
      t0: Long, last: Long, n: Long, open: Boolean,
      closedSessions: Long, closedDurMs: Long, events: Long)

  case class UserAgg(user_id: Long, n_sessions: Long, n_events: Long, avg_session_ms: Double)

  private val GapMs = 1800000L

  private[streaming] def foldGroup(
      uid: Long, evs: Iterator[Ev], state: GroupState[SessState]): Iterator[UserAgg] = {
    val sorted = evs.toSeq.sortBy(e => (e.ms, e.event_id))
    var st = state.getOption.getOrElse(SessState(0L, 0L, 0L, open = false, 0L, 0L, 0L))
    sorted.foreach { e =>
      st =
        if (!st.open)
          st.copy(t0 = e.ms, last = e.ms, n = 1, open = true, events = st.events + 1)
        else if (e.ms - st.last > GapMs)
          st.copy(t0 = e.ms, last = e.ms, n = 1,
            closedSessions = st.closedSessions + 1,
            closedDurMs = st.closedDurMs + (st.last - st.t0),
            events = st.events + 1)
        else
          st.copy(last = e.ms, n = st.n + 1, events = st.events + 1)
    }
    state.update(st)
    val sessions = st.closedSessions + (if (st.open) 1L else 0L)
    val dur = st.closedDurMs + (if (st.open) st.last - st.t0 else 0L)
    if (sessions == 0) Iterator.empty
    else Iterator(UserAgg(uid, sessions, st.events, dur.toDouble / sessions))
  }

  /** Run the stateful sessionization stream over the events archive to
    * completion; returns the final per-user summaries.
    *
    * Sink model: each Update-mode micro-batch is upserted EXECUTOR-SIDE
    * — the batch (already one refreshed row per touched user) is
    * appended to a hash-bucketed parquet state dir stamped with its
    * epoch, and the final state is the last-epoch row per user (one
    * window over (bucket, user)). Nothing is ever collected to the
    * driver, so state scales with #users across executors — at 100 TB
    * the parquet state dir is the stand-in for the real KV/serving sink
    * the Update stream would feed, with the same keyed-upsert contract.
    */
  def run(s: SparkSession, eventsPath: String): DataFrame = {
    import s.implicits._
    graft.core.Tables.ensureNanosConf(s)
    val schema = s.read.parquet(graft.core.Tables.escapeGlob(eventsPath)).schema
    val glob = graft.core.Tables.srcGlob(eventsPath)
    val ckpt = TmpDirs.dir("sess-ckpt")
    val state = TmpDirs.dir("sess-state")
    val stream = s.readStream.schema(schema).parquet(glob)
      .select($"user_id", $"event_id", graft.core.Tables.msExpr(schema).as("ms"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(foldGroup)
    // flatMapGroupsWithState keeps one state store per shuffle
    // partition; scope the shard count to the stream. NoTimeout fold:
    // a no-data batch could fire nothing — off (Sessions.streamScope).
    graft.core.Sessions.streamScope(s) {
      val q = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserAgg], epochId: Long) =>
        // keyed upsert, executor-side: bucket by user hash (the real
        // sink's shard key), stamp the epoch; last epoch wins on read.
        // Dynamic overwrite keyed by epoch makes a RETRIED epoch (Spark
        // re-runs a failed foreachBatch with the same epochId) replace
        // its own partitions instead of appending duplicate rows — the
        // same idempotence-by-batchId contract as the replay sink.
        batch.toDF()
          .withColumn("bucket", pmod(xxhash64(col("user_id")), lit(16)))
          .withColumn("epoch", lit(epochId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket", "epoch").parquet(state)
      }
      .start()
      q.awaitTermination()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"epoch".desc)
    s.read.parquet(state)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"n_sessions", $"n_events",
        Det.dround($"avg_session_ms", 2).as("avg_session_ms"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------------
  // Event-time-timeout variant: exact under OUT-OF-ORDER multi-batch
  // replays. The NoTimeout fold above keeps one open session and assumes
  // batches arrive in event-time order; this variant's state is the SET
  // of open session INTERVALS (t0, last, n) plus closed totals, merged
  // under the gap rule on every batch — two intervals an out-of-order
  // batch bridges collapse into one, so the fold is order-independent.
  // Interval merging is exact for sessionization: an interval's points
  // have consecutive gaps ≤ GapMs, so any new point inside [t0, last] is
  // within GapMs of some chain point, and points beyond the ends merge
  // iff within GapMs of t0/last — precisely the sorted-merge rule below.
  //
  // The EVENT-TIME TIMEOUT is the state bound: when the watermark passes
  // an open interval's last + gap, no in-watermark event can ever extend
  // it, so it folds into the closed totals (O(1) per user) and the
  // refreshed summary is re-emitted. Per-user state is thus O(open
  // intervals within the watermark horizon) — bounded by the disorder
  // the watermark admits, not by history. (Closed totals live for the
  // user's lifetime — the O(#users) serving-state design; a deployment
  // retiring dead users would add a TTL timeout that emits-and-drops.)
  //
  // Late events (event time below the watermark) are DROPPED by Spark
  // before the fold — the watermark delay is the declared disorder
  // tolerance, exactly the replay contract a production stream states.
  // ReplayTwinSpec exercises both regimes: an event-time-ordered
  // throttled replay (timeouts fire between batches) and a fully
  // shuffled replay under a large delay (pure interval-merge exactness)
  // — both must equal the batch twin's oracle.
  // ---------------------------------------------------------------------

  case class EvT(user_id: Long, event_id: Long, ms: Long,
      ets: java.sql.Timestamp)

  case class Iv(t0: Long, last: Long, n: Long)

  case class SessStateEt(
      closedSessions: Long, closedDurMs: Long, closedEvents: Long,
      open: Seq[Iv])

  private[graft] def mergeIvs(ivs: Seq[Iv]): Seq[Iv] =
    ivs.sortBy(i => (i.t0, i.last)).foldLeft(List.empty[Iv]) { (acc, iv) =>
      acc match {
        case h :: t if iv.t0 - h.last <= GapMs =>
          Iv(h.t0, math.max(h.last, iv.last), h.n + iv.n) :: t
        case _ => iv :: acc
      }
    }.reverse

  private[streaming] def foldGroupEt(
      uid: Long, evs: Iterator[EvT],
      state: GroupState[SessStateEt]): Iterator[UserAgg] = {
    val prev = state.getOption.getOrElse(SessStateEt(0L, 0L, 0L, Nil))
    val fresh = evs.map(e => Iv(e.ms, e.ms, 1L)).toSeq
    val merged = mergeIvs(prev.open ++ fresh)
    // close every interval the watermark has passed (no in-watermark
    // event can extend it): fold into the O(1) closed totals
    val wm = state.getCurrentWatermarkMs()
    val (expired, open) = merged.partition(_.last + GapMs < wm)
    val st = SessStateEt(
      prev.closedSessions + expired.size,
      prev.closedDurMs + expired.map(i => i.last - i.t0).sum,
      prev.closedEvents + expired.map(_.n).sum,
      open)
    state.update(st)
    // re-arm: fire when the watermark passes the EARLIEST open interval's
    // close point (must be strictly beyond the current watermark)
    if (open.nonEmpty)
      state.setTimeoutTimestamp(
        math.max(open.map(_.last).min + GapMs + 1L, wm + 1L))
    val sessions = st.closedSessions + open.size
    val events = st.closedEvents + open.map(_.n).sum
    val dur = st.closedDurMs + open.map(i => i.last - i.t0).sum
    if (sessions == 0) Iterator.empty
    else Iterator(UserAgg(uid, sessions, events, dur.toDouble / sessions))
  }

  /** Event-time-timeout run: same keyed-upsert sink contract as [[run]],
    * but exact under out-of-order multi-batch replays within the
    * declared watermark delay, with open-interval state bounded by the
    * timeout (see the variant note above).
    */
  def runEventTime(
      s: SparkSession, eventsPath: String, delay: String = "1 hour",
      maxFilesPerTrigger: Int = 0): DataFrame = {
    import s.implicits._
    graft.core.Tables.ensureNanosConf(s)
    val schema = s.read.parquet(graft.core.Tables.escapeGlob(eventsPath)).schema
    val glob = graft.core.Tables.srcGlob(eventsPath)
    val ckpt = TmpDirs.dir("sess-et-ckpt")
    val state = TmpDirs.dir("sess-et-state")
    val reader = s.readStream.schema(schema)
    if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val stream = reader.parquet(glob)
      .select($"user_id", $"event_id", graft.core.Tables.msExpr(schema).as("ms"),
        timestamp_millis(graft.core.Tables.msExpr(schema)).as("ets"))
      .withWatermark("ets", delay)
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(foldGroupEt)
    // The trailing no-data batch would fire event-time timeouts, but a
    // timeout emission RE-STATES the same summary (sessions/events/dur
    // are closed + open totals — invariant to an interval merely moving
    // from open to closed), so the last-epoch-per-user read below is
    // unchanged without it — off (Sessions.streamScope). Timeouts still
    // fire between DATA batches in throttled runs (ReplayTwinSpec).
    graft.core.Sessions.streamScope(s) {
      val q = stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserAgg], epochId: Long) =>
          batch.toDF()
            .withColumn("bucket", pmod(xxhash64(col("user_id")), lit(16)))
            .withColumn("epoch", lit(epochId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket", "epoch").parquet(state)
        }
        .start()
      q.awaitTermination()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"epoch".desc)
    s.read.parquet(state)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"n_sessions", $"n_events",
        Det.dround($"avg_session_ms", 2).as("avg_session_ms"))
      .orderBy("user_id")
  }

  private val streamSessionEventTime = Q(
    "stream_session_eventtime",
    (s, d) => {
      import s.implicits._
      if (graft.core.Tables.eventsEmpty(s, d))
        Seq.empty[(Long, Long, Long, Double)]
          .toDF("user_id", "n_sessions", "n_events", "avg_session_ms")
      else runEventTime(s, s"$d/events.parquet")
    },
    // Identical oracle to stream_session/stream_session_state — the
    // event-time variant must compute the same sessions.
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

  private val streamSessionState = Q(
    "stream_session_state",
    (s, d) => {
      import s.implicits._
      // Tables.events heals the nanos-timestamp conf before the raw
      // streaming read in run() touches the TIMESTAMP(NANOS) parquet.
      if (graft.core.Tables.eventsEmpty(s, d))
        Seq.empty[(Long, Long, Long, Double)]
          .toDF("user_id", "n_sessions", "n_events", "avg_session_ms")
      else run(s, s"$d/events.parquet")
    },
    // Identical oracle to the batch twin stream_session (EventTime.scala)
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

  val qs: Seq[Q] = Seq(streamSessionState, streamSessionEventTime)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, OSql, Q, Tables}

/** Event-stream analytics over the relational archive: gap-filling,
  * robust central tendency, time-weighted averaging, and cohort
  * retention — the reporting-side operators a replay consumer runs on
  * the landed event table. All hash-verified against DuckDB.
  *
  * Scale shape (the 100 TB stance, per operator):
  *  - window_fill_forward and event_time_weighted are ONE
  *    partitionBy(user_id) window each — key-partitioned (one hash
  *    shuffle, state bounded per user), never a global window;
  *  - agg_median_mode's median is a per-group sort-based exact
  *    percentile (grouped, so each group sorts independently); the mode
  *    path is two partial+final aggs — bucket counts collapse MAP-SIDE
  *    — plus a per-group top-1 window over the bucket table (bounded by
  *    |buckets|, not |events|);
  *  - cohort_retention is three partial+final aggs chained on the same
  *    user_id hash partitioning (distinct user-days → per-user min →
  *    cell counts): Catalyst reuses the exchange, and no cell count
  *    ever touches the driver.
  */
object AnalyticsOps {
  import Det._

  // ------------------------------------------------------------------
  // window_fill_forward — last-observation-carried-forward gap filling
  // (the standard sensor/telemetry repair): `error` events carry no
  // usable reading, so their value is nulled and refilled from the
  // user's most recent non-null observation. IGNORE NULLS last_value
  // over a (user, time) window, exercised in both engines.
  // ------------------------------------------------------------------

  private val windowFillForward = Q(
    "window_fill_forward",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id", $"event_id", $"ms",
          when($"event_type" === "error", lit(null).cast("double"))
            .otherwise($"value").as("v"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ms".asc, $"event_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select($"user_id", $"event_id", $"ms", $"v",
        last($"v", ignoreNulls = true).over(w).as("v_filled"))
        .orderBy("user_id", "ms", "event_id")
    },
    // NULLS FIRST spelled on the ms keys: a NULL ts must order the
    // same way as Spark's ASC default (DuckDB defaults NULLS LAST)
    Some("SELECT user_id, event_id, epoch_ms(ts) AS ms, v, " +
      "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id " +
      "ORDER BY epoch_ms(ts) NULLS FIRST, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled " +
      "FROM (SELECT user_id, event_id, ts, " +
      "CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v " +
      "FROM events) ORDER BY user_id, ms NULLS FIRST, event_id"))

  // ------------------------------------------------------------------
  // agg_median_mode — exact interpolated median plus a DETERMINISTIC
  // mode per event_type. SQL `mode()` leaves ties implementation-
  // defined, so the mode is computed explicitly: integer-bucketed
  // counts ranked (cnt desc, bucket asc) — bit-stable in any engine.
  // ------------------------------------------------------------------

  private val aggMedianMode = Q(
    "agg_median_mode",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val med = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          dround(percentile($"value", lit(0.5)), 4).as("median_v"))
      val buckets = ev
        .select($"event_type", floor($"value").cast("long").as("b"))
        .groupBy("event_type", "b").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy($"event_type")
        .orderBy($"cnt".desc, $"b".asc)
      val mode = buckets.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"event_type", $"b".as("mode_bucket"), $"cnt".as("mode_cnt"))
      med.join(mode, "event_type").orderBy("event_type")
    },
    Some("WITH med AS (SELECT event_type, count(*) AS n, " +
      OSql.sround("quantile_cont(value, 0.5)", 4) + " AS median_v " +
      "FROM events GROUP BY 1), " +
      "bk AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS b, " +
      "count(*) AS cnt FROM events GROUP BY 1, 2), " +
      "md AS (SELECT event_type, b AS mode_bucket, cnt AS mode_cnt, " +
      "row_number() OVER (PARTITION BY event_type " +
      "ORDER BY cnt DESC, b ASC NULLS FIRST) AS rn FROM bk) " +
      "SELECT m.event_type, m.n, m.median_v, md.mode_bucket, md.mode_cnt " +
      "FROM med m JOIN md ON m.event_type = md.event_type AND md.rn = 1 " +
      "ORDER BY 1"))

  // ------------------------------------------------------------------
  // event_time_weighted — per-user TIME-WEIGHTED average of the value
  // signal (piecewise-constant hold until the next event): the honest
  // average for irregularly-sampled telemetry, where a plain mean
  // over-weights bursts. Weights are exact integer ms deltas; the
  // value·Δ products accumulate in DECIMAL so the sum is exact and
  // order-independent in both engines (cast to double only once, at
  // the end).
  // ------------------------------------------------------------------

  private val eventTimeWeighted = Q(
    "event_time_weighted",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms".asc, $"event_id".asc)
      Tables.events(s, d)
        .select($"user_id", $"event_id", $"ms", $"value")
        .withColumn("next_ms", lead($"ms", 1).over(w))
        .filter($"next_ms".isNotNull)
        .select($"user_id", ($"next_ms" - $"ms").as("delta"), $"value")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum($"delta").cast("long").as("span_ms"),
          dround(sum($"value".cast(Dec) * $"delta").cast("double") /
            sum($"delta").cast("double"), 6).as("twa"))
        .orderBy("user_id")
    },
    Some("WITH seq AS (SELECT user_id, value, epoch_ms(ts) AS ms, " +
      "lead(epoch_ms(ts)) OVER (PARTITION BY user_id " +
      "ORDER BY epoch_ms(ts), event_id) AS next_ms FROM events), " +
      "iv AS (SELECT user_id, next_ms - ms AS delta, value FROM seq " +
      "WHERE next_ms IS NOT NULL) " +
      "SELECT user_id, count(*) AS n_intervals, " +
      "CAST(sum(delta) AS BIGINT) AS span_ms, " +
      OSql.sround("CAST(sum(CAST(value AS DECIMAL(20,6)) * delta) AS DOUBLE) " +
        "/ CAST(sum(delta) AS DOUBLE)", 6) + " AS twa " +
      "FROM iv GROUP BY 1 ORDER BY 1"))

  // ------------------------------------------------------------------
  /** Calendar gap-fill — the missing-bucket repair every time-series
    * report needs: daily counts per event type INCLUDING days with no
    * events (reported as zero), over the archive's [min, max] day
    * span. The spine is `sequence(min_day, max_day)` exploded from ONE
    * aggregated row and cross-joined with the distinct type set —
    * spine size is days × types (bounded by the calendar, not the
    * data), so the only data-sized operations are the per-(type, day)
    * partial+final count and one left join from the (tiny,
    * broadcast-able) spine to the counts. A missing day surfacing as
    * an absent row instead of a zero is the classic dashboard bug
    * this key pins against.
    */
  private val windowGapFill = Q(
    "window_gap_fill",
    (s, d) => {
      import s.implicits._
      // epoch-day arithmetic, not to_date(timestamp_millis(...)): the
      // latter reads the SESSION timezone, and an externally-built
      // non-UTC session would shift events across day boundaries while
      // the oracle's date_trunc over the naive ts stays UTC.
      // FLOOR-aligned, not `div`: Spark's div truncates toward zero, so
      // a pre-epoch event (negative ms) would land on 1970-01-01 while
      // the oracle's date_trunc floors it onto 1969-12-31. pmod is
      // always non-negative, so (ms - pmod) div is exact floor division.
      val ev = Tables.events(s, d)
        .select($"event_type",
          expr("date_add(date'1970-01-01', " +
            "cast((ms - pmod(ms, 86400000)) div 86400000 as int))")
            .as("day"))
      val counts = ev.groupBy($"event_type", $"day").agg(count(lit(1)).as("c"))
      val spine = ev.agg(min($"day").as("mn"), max($"day").as("mx"))
        .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
      val types = ev.select($"event_type").distinct()
      spine.crossJoin(types)
        .join(counts, Seq("event_type", "day"), "left_outer")
        .select($"event_type", $"day".cast("string").as("day"),
          coalesce($"c", lit(0L)).as("cnt"))
        .orderBy("event_type", "day")
    },
    Some("WITH e AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day " +
      "FROM events), " +
      "c AS (SELECT event_type, day, count(*) AS c FROM e GROUP BY 1, 2), " +
      "b AS (SELECT min(day) AS mn, max(day) AS mx FROM e), " +
      "spine AS (SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP), " +
      "CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b), " +
      "t AS (SELECT DISTINCT event_type FROM e) " +
      "SELECT t.event_type, CAST(spine.day AS VARCHAR) AS day, " +
      "CAST(COALESCE(c.c, 0) AS BIGINT) AS cnt " +
      "FROM spine CROSS JOIN t " +
      "LEFT JOIN c ON c.event_type = t.event_type AND c.day = spine.day " +
      "ORDER BY 1, 2"))

  // cohort_retention — the classic retention triangle: users grouped by
  // first-seen day (cohort), counted on each subsequent active day
  // offset. Exact distinct counting via the (user, day) distinct set.
  // ------------------------------------------------------------------

  private val cohortRetention = Q(
    "cohort_retention",
    (s, d) => {
      import s.implicits._
      // min-over-user WINDOW, not a groupBy+self-join: the join spelling
      // scans the event table twice (Catalyst shares no subtrees); the
      // unordered window computes the cohort day on the same user_id
      // hash partitioning the distinct already produced — one scan, and
      // the distinct's exchange is reused.
      val ud = Tables.events(s, d)
        .select($"user_id", expr(Det.fdivExpr("ms", "86400000")).as("day"))
        .distinct()
      ud.withColumn("cohort_day",
        min($"day").over(Window.partitionBy($"user_id")))
        .groupBy($"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },
    Some("WITH ud AS (SELECT DISTINCT user_id, " +
      "epoch_ms(ts) // 86400000 AS day FROM events), " +
      "c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1) " +
      "SELECT cohort_day, day - cohort_day AS day_offset, " +
      "count(*) AS n_users FROM ud JOIN c USING (user_id) " +
      "GROUP BY 1, 2 ORDER BY 1, 2"))

  // ------------------------------------------------------------------
  // window_sliding_distinct — trailing-7-day DISTINCT active users per
  // observed day: the rolling-reach metric (DAU→WAU) that plain window
  // aggregation cannot express, because COUNT(DISTINCT) over a sliding
  // frame is not decomposable. The naive plan replicates every fact
  // row 7× (one copy per window it falls into) and pays a count-
  // distinct shuffle per day; this spelling is linear:
  //   1. distinct (user, day) ledger — one hash shuffle, map-side
  //      collapse, ≤ |users|·|days| rows;
  //   2. per-user COVERAGE ISLANDS via ONE keyed window: active days
  //      with gaps ≤ 6 merge into [min, max+6] covered intervals —
  //      consecutive islands are >6 apart, so a user's intervals are
  //      DISJOINT and "islands covering day d" = "users covering d";
  //   3. interval endpoints become +1/−1 deltas, aggregated per day
  //      map-side to a ≤ 2·|days| ledger — calendar-bounded, it grows
  //      with time, never with data volume;
  //   4. the running coverage at each observed day resolves as a
  //      broadcast theta prefix join over the two bounded ledgers
  //      (the moving_avg discipline — no raw-fact window anywhere).
  // The oracle is the naive spine × ledger range join with a real
  // COUNT(DISTINCT); the hash match proves island-sweep ≡ naive.
  // ------------------------------------------------------------------

  private val windowSlidingDistinct = Q(
    "window_sliding_distinct",
    (s, d) => {
      import s.implicits._
      val ud = Tables.events(s, d)
        .filter($"user_id".isNotNull && $"ms".isNotNull)
        .select($"user_id", expr(Det.fdivExpr("ms", "86400000")).as("day"))
        .distinct()
      val w = Window.partitionBy($"user_id").orderBy($"day".asc)
      val run = Window.partitionBy($"user_id").orderBy($"day".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val islands = ud
        .withColumn("is_new",
          when(lag($"day", 1).over(w).isNull ||
            $"day" - lag($"day", 1).over(w) > 6, 1L).otherwise(0L))
        .withColumn("island", sum($"is_new").over(run))
        .groupBy($"user_id", $"island")
        .agg(min($"day").as("s"), (max($"day") + 7L).as("e"))
      // endpoint deltas collapse map-side onto the day domain; both
      // endpoints explode out of ONE island row (a unionAll of two
      // selects would evaluate the window subtree twice — Catalyst
      // shares no subtrees across union legs)
      val deltas = islands
        .select(explode(array(
          struct($"s".as("day"), lit(1L).as("delta")),
          struct($"e".as("day"), lit(-1L).as("delta")))).as("x"))
        .groupBy($"x.day".as("day")).agg(sum($"x.delta").as("delta"))
      val spine = ud.select($"day").distinct()
      spine.as("sp").join(broadcast(deltas.as("dl")),
          $"dl.day" <= $"sp.day")
        .groupBy($"sp.day".as("day"))
        .agg(sum($"dl.delta").cast("long").as("u7"))
        .orderBy("day")
    },
    Some("WITH ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day " +
      "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL), " +
      "sp AS (SELECT DISTINCT day FROM ud) " +
      "SELECT sp.day, CAST(count(DISTINCT ud.user_id) AS BIGINT) AS u7 " +
      "FROM sp JOIN ud ON ud.day BETWEEN sp.day - 6 AND sp.day " +
      "GROUP BY 1 ORDER BY 1"))

  // ------------------------------------------------------------------
  // window_cumulative_share — the revenue PACING CURVE: per day, the
  // running share of total archive revenue (the "how far through the
  // quarter's bookings are we" readout; its inverse is how budget
  // pacing and anomaly-free-growth checks are eyeballed). The fact
  // collapses map-side to the calendar-bounded daily ledger; the
  // running sum rides the two-phase prefix (32-day buckets + the
  // broadcast offsets merge — no single-partition WindowExec even on
  // the ledger); the grand total arrives as a broadcast 1-row
  // aggregate OF THE LEDGER (never a second fact pass), and the share
  // is the exact floor-quantized integer (10⁶·cum) div total.
  // ------------------------------------------------------------------

  private val windowCumulativeShare = Q(
    "window_cumulative_share",
    (s, d) => {
      import s.implicits._
      val daily = Tables.events(s, d)
        .select(expr(Det.fdivExpr("ms", "86400000")).as("day"),
          round($"value" * 100).cast("long").as("c"))
        .groupBy("day").agg(sum($"c").as("v"))
        .withColumn("b", expr(Det.fdivExpr("day", "32")))
      val local = Window.partitionBy($"b").orderBy($"day".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offs = Windows.prefixOffsets(
        daily.groupBy("b").agg(sum($"v").as("n")), "b")
      val tot = daily.agg(sum($"v").as("total"))
      daily.withColumn("lv", sum($"v").over(local))
        .join(broadcast(offs), "b")
        .crossJoin(broadcast(tot))
        .select($"day", $"v".as("day_cents"),
          ($"lv" + $"off").as("cum_cents"),
          when($"total" > 0,
            (expr("(1000000 * (lv + off)) div total").cast("double") / 1e6))
            .as("cum_share"))
        .orderBy("day")
    },
    Some("WITH daily AS (SELECT epoch_ms(ts) // 86400000 AS day, " +
      "SUM(CAST(round(value*100) AS BIGINT)) AS v FROM events GROUP BY 1), " +
      "t AS (SELECT CAST(SUM(v) AS BIGINT) AS total FROM daily), " +
      "r AS (SELECT day, v, SUM(v) OVER (ORDER BY day ASC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM daily) " +
      "SELECT r.day, CAST(r.v AS BIGINT) AS day_cents, " +
      "CAST(r.cum AS BIGINT) AS cum_cents, " +
      "CASE WHEN t.total > 0 THEN " +
      "CAST((1000000 * r.cum) // t.total AS DOUBLE) / 1e6 END AS cum_share " +
      "FROM r, t ORDER BY r.day"))

  val qs: Seq[Q] =
    Seq(windowFillForward, aggMedianMode, eventTimeWeighted, cohortRetention,
      windowGapFill, windowSlidingDistinct, windowCumulativeShare)
}

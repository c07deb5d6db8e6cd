package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{Det, OSql, Q, Tables}

/** Ordered-sequence analytics over the landed event archive: run-length
  * islands, Markov transition structure, interval concurrency, funnel
  * latency, robust anomaly flagging, and the exact equi-depth histogram
  * — the session/behavior reporting a replay consumer runs after the
  * stream lands. All hash-verified against DuckDB.
  *
  * Scale shape (the 100 TB stance, per operator):
  *  - seq_gap_islands / markov_transitions: every window is
  *    partitionBy(user_id) — ONE hash shuffle, per-user state, never a
  *    global WindowExec; the adjacent Window ops share one sort.
  *  - interval_concurrency: the classic sweep-line (+1/−1 endpoints,
  *    global running sum) is spelled TWO-PHASE — range-shuffle the
  *    endpoint stream, local cumulative sums per partition, then a
  *    P-row broadcast prefix-offset merge ([[Windows.prefixOffsets]]).
  *    No single-partition window anywhere; the global sweep costs one
  *    range exchange regardless of event cardinality.
  *  - funnel_time_to_convert: two conditional-min aggregates on the
  *    SAME user_id partitioning (one shuffle, exchange reused) + a
  *    single-row exact-percentile reduce.
  *  - anomaly_zscore: per-type sufficient statistics (n, Σx, Σx² in
  *    DECIMAL — exact, order-independent) collapse map-side to
  *    |event_types| rows, broadcast back over the fact scan: the fact
  *    table is read once and never shuffled.
  *  - agg_histogram_equidepth: exact global depth buckets via the same
  *    two-phase global-row-number machinery as window_rank_dense — a
  *    range shuffle + broadcast offsets, not a global sort-to-one-task.
  */
object SeqOps {
  import Det._

  /** Exact sufficient-statistic decimal: Σx and Σx² stay exact for
    * |x| ≤ ~5e2 out to ~1e29 rows — order-independent at any scale.
    */
  private val Dec38: DecimalType = DecimalType(38, 6)

  // ------------------------------------------------------------------
  // seq_gap_islands — gaps-and-islands: collapse each user's ordered
  // event stream into maximal runs of the same event_type. Spelled as
  // lag → new-run flag → running sum (= island id) → per-island agg;
  // the two window passes share the identical (user_id; ms, event_id)
  // spec, so Catalyst plans ONE exchange + one sort for both.
  // ------------------------------------------------------------------

  private val seqGapIslands = Q(
    "seq_gap_islands",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms".asc, $"event_id".asc)
      val run = Window.partitionBy($"user_id").orderBy($"ms".asc, $"event_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select($"user_id", $"event_id", $"ms", $"event_type")
        .withColumn("is_new",
          when(lag($"event_type", 1).over(w).isNull ||
            lag($"event_type", 1).over(w) =!= $"event_type", 1L).otherwise(0L))
        .withColumn("island", sum($"is_new").over(run))
        .groupBy($"user_id", $"island", $"event_type")
        .agg(count(lit(1)).as("run_len"),
          min($"ms").as("start_ms"), max($"ms").as("end_ms"))
        .orderBy("user_id", "island")
    },
    Some("WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type " +
      "FROM events), " +
      "f AS (SELECT user_id, event_id, ms, event_type, " +
      "CASE WHEN lag(event_type) OVER w IS NULL OR lag(event_type) OVER w <> event_type " +
      "THEN 1 ELSE 0 END AS is_new FROM e " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ms ASC, event_id ASC)), " +
      "i AS (SELECT user_id, ms, event_type, CAST(SUM(is_new) OVER (PARTITION BY user_id " +
      "ORDER BY ms ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
      "AS BIGINT) AS island FROM f) " +
      "SELECT user_id, island, event_type, count(*) AS run_len, " +
      "min(ms) AS start_ms, max(ms) AS end_ms " +
      "FROM i GROUP BY 1, 2, 3 ORDER BY user_id, island"))

  // ------------------------------------------------------------------
  // markov_transitions — first-order event-type transition matrix:
  // per-user (prev → next) bigrams via ONE keyed lag window, then a
  // partial+final count keyed by the pair. Row probabilities join the
  // per-prev totals back by broadcast (|event_types| rows). The
  // probability is one double division of two exact longs — bit-equal
  // in any engine.
  // ------------------------------------------------------------------

  private val markovTransitions = Q(
    "markov_transitions",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms".asc, $"event_id".asc)
      val pairs = Tables.events(s, d)
        .select($"user_id", $"event_id", $"ms", $"event_type")
        .withColumn("prev", lag($"event_type", 1).over(w))
        .filter($"prev".isNotNull)
      val cnt = pairs.groupBy($"prev", $"event_type".as("next"))
        .agg(count(lit(1)).as("cnt"))
      val tot = cnt.groupBy($"prev").agg(sum($"cnt").cast("long").as("tot"))
      cnt.join(broadcast(tot), "prev")
        .select($"prev", $"next", $"cnt",
          dround($"cnt".cast("double") / $"tot", 6).as("p"))
        .orderBy("prev", "next")
    },
    Some("WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type " +
      "FROM events), " +
      "b AS (SELECT user_id, event_type AS next, lag(event_type) OVER " +
      "(PARTITION BY user_id ORDER BY ms ASC, event_id ASC) AS prev FROM e), " +
      "c AS (SELECT prev, next, count(*) AS cnt FROM b WHERE prev IS NOT NULL " +
      "GROUP BY 1, 2), " +
      "t AS (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS tot FROM c GROUP BY 1) " +
      "SELECT c.prev, c.next, c.cnt, " +
      OSql.sround("CAST(c.cnt AS DOUBLE) / t.tot", 6) + " AS p " +
      "FROM c JOIN t USING (prev) ORDER BY prev, next"))

  // ------------------------------------------------------------------
  // interval_concurrency — peak concurrency of 30-second event
  // intervals [ms, ms+30000), the sweep-line classic. Endpoints carry
  // +1/−1; ends sort BEFORE starts at equal t (delta ASC), making the
  // interval half-open. The global running sum is two-phase: local
  // cumsum within range partitions + broadcast prefix offsets — at
  // equal (t, delta) the running values form the same multiset in any
  // order, so peak and first-peak-time are total-order-independent.
  // ------------------------------------------------------------------

  private val intervalConcurrency = Q(
    "interval_concurrency",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"ms")
      val ep = ev.select($"ms".as("t"), lit(1L).as("delta"))
        .unionAll(ev.select(($"ms" + 30000L).as("t"), lit(-1L).as("delta")))
      val ids = ep
        .repartitionByRange(32, $"t".asc, $"delta".asc)
        .sortWithinPartitions($"t".asc, $"delta".asc)
        .withColumn("mid", monotonically_increasing_id())
        .withColumn("pid", shiftright($"mid", 33))
        .localCheckpoint(true)
      val local = Window.partitionBy($"pid").orderBy($"mid".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offs = Windows.prefixOffsets(
        ids.groupBy("pid").agg(sum($"delta").as("n")), "pid")
      val r = ids
        .withColumn("cum", sum($"delta").over(local))
        .join(broadcast(offs), "pid")
        .select($"t", ($"cum" + $"off").as("conc"))
      val peak = r.agg(max($"conc").as("peak"))
      r.join(broadcast(peak), $"conc" === $"peak")
        .groupBy($"peak").agg(min($"t").as("first_peak_ms"))
        .select($"peak", $"first_peak_ms")
    },
    Some("WITH e AS (SELECT epoch_ms(ts) AS ms FROM events), " +
      "ep AS (SELECT ms AS t, 1 AS delta FROM e " +
      "UNION ALL SELECT ms + 30000, -1 FROM e), " +
      "r AS (SELECT t, CAST(SUM(delta) OVER (ORDER BY t ASC, delta ASC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc FROM ep), " +
      "p AS (SELECT MAX(conc) AS peak FROM r) " +
      "SELECT p.peak, (SELECT MIN(t) FROM r WHERE r.conc = p.peak) AS first_peak_ms " +
      "FROM p"))

  // ------------------------------------------------------------------
  // funnel_time_to_convert — latency distribution of the view →
  // purchase funnel edge: per user, first view and first purchase
  // AFTER it; exact interpolated p50/p90 over the deltas. Both
  // conditional mins come from ONE aggregate on one user_id shuffle.
  // ------------------------------------------------------------------

  private val funnelTimeToConvert = Q(
    "funnel_time_to_convert",
    (s, d) => {
      import s.implicits._
      val per = Tables.events(s, d)
        .groupBy($"user_id")
        .agg(min(when($"event_type" === "view", $"ms")).as("v_ms"),
          min(when($"event_type" === "purchase", $"ms")).as("p_ms"))
        .filter($"v_ms".isNotNull && $"p_ms".isNotNull && $"p_ms" > $"v_ms")
        .select(($"p_ms" - $"v_ms").as("delta"))
      per.agg(count(lit(1)).as("n_converted"),
        dround(percentile($"delta", lit(0.5)), 4).as("p50_ms"),
        dround(percentile($"delta", lit(0.9)), 4).as("p90_ms"),
        max($"delta").as("max_ms"))
    },
    Some("WITH per AS (SELECT user_id, " +
      "MIN(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS v_ms, " +
      "MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS p_ms " +
      "FROM events GROUP BY 1), " +
      "dl AS (SELECT p_ms - v_ms AS delta FROM per " +
      "WHERE v_ms IS NOT NULL AND p_ms IS NOT NULL AND p_ms > v_ms) " +
      "SELECT count(*) AS n_converted, " +
      OSql.sround("quantile_cont(delta, 0.5)", 4) + " AS p50_ms, " +
      OSql.sround("quantile_cont(delta, 0.9)", 4) + " AS p90_ms, " +
      "MAX(delta) AS max_ms FROM dl"))

  // ------------------------------------------------------------------
  // anomaly_zscore — flag events whose value sits > 3σ from its
  // event_type's mean. μ and σ come from EXACT decimal sufficient
  // statistics (n, Σx, Σx²) so they are order-independent; the z
  // arithmetic is the identical IEEE expression tree in both engines
  // (μ spelled s1/n everywhere), making the |z| > 3 boundary
  // bit-deterministic. One fact scan, map-side stat collapse, tiny
  // broadcast back — the fact table never shuffles.
  // ------------------------------------------------------------------

  private val anomalyZscore = Q(
    "anomaly_zscore",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val st = ev.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(Dec38)).cast("double").as("s1"),
          sum(($"value" * $"value").cast(Dec38)).cast("double").as("s2"))
        .withColumn("mu", $"s1" / $"n")
        .withColumn("sigma", sqrt($"s2" / $"n" - ($"s1" / $"n") * ($"s1" / $"n")))
      ev.select($"event_id", $"event_type", $"value")
        .join(broadcast(st), "event_type")
        .withColumn("z", ($"value" - $"mu") / $"sigma")
        .filter(abs($"z") > 3.0)
        .select($"event_id", $"event_type", $"value", dround($"z", 4).as("z"))
        .orderBy("event_id")
    },
    Some("WITH st AS (SELECT event_type, count(*) AS n, " +
      "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1, " +
      "CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2 " +
      "FROM events GROUP BY 1), " +
      "sg AS (SELECT event_type, s1 / n AS mu, " +
      "sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sigma FROM st), " +
      "z AS (SELECT e.event_id, e.event_type, e.value, " +
      "(e.value - sg.mu) / sg.sigma AS z FROM events e " +
      "JOIN sg USING (event_type)) " +
      "SELECT event_id, event_type, value, " + OSql.sround("z", 4) + " AS z " +
      "FROM z WHERE abs(z) > 3.0 ORDER BY event_id"))

  // ------------------------------------------------------------------
  // agg_histogram_equidepth — EXACT 8-bucket equi-depth histogram of
  // the value column (bucket boundaries from the true global order,
  // not a sketch — the complement of agg_approx_quantile). The global
  // row number is the two-phase range-shuffle + broadcast-prefix
  // spelling (no single-partition WindowExec); the bucket rule
  // floor((rn−1)·8 / n) is pure integer arithmetic, restated verbatim
  // in the oracle.
  // ------------------------------------------------------------------

  private val aggHistogramEquidepth = Q(
    "agg_histogram_equidepth",
    (s, d) => {
      import s.implicits._
      val ids = Tables.events(s, d)
        .select($"event_id", $"value")
        .repartitionByRange(32, $"value".asc, $"event_id".asc)
        .sortWithinPartitions($"value".asc, $"event_id".asc)
        .withColumn("mid", monotonically_increasing_id())
        .withColumn("pid", shiftright($"mid", 33))
        .withColumn("lrn", $"mid".bitwiseAND(lit((1L << 33) - 1)) + 1)
        .localCheckpoint(true)
      val offs = Windows.prefixOffsets(
        ids.groupBy("pid").agg(count(lit(1)).as("n")), "pid")
      val tot = ids.agg(count(lit(1)).as("nn"))
      ids.join(broadcast(offs), "pid")
        .crossJoin(broadcast(tot))
        .select($"value", expr("((lrn + off - 1) * 8) div nn").as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("cnt"), min($"value").as("lo"), max($"value").as("hi"))
        .orderBy("bucket")
    },
    Some("WITH r AS (SELECT value, " +
      "row_number() OVER (ORDER BY value ASC, event_id ASC) AS rn, " +
      "count(*) OVER () AS nn FROM events) " +
      "SELECT CAST(((rn - 1) * 8) // nn AS BIGINT) AS bucket, " +
      "count(*) AS cnt, min(value) AS lo, max(value) AS hi " +
      "FROM r GROUP BY 1 ORDER BY 1"))

  val qs: Seq[Q] = Seq(
    seqGapIslands, markovTransitions, intervalConcurrency,
    funnelTimeToConvert, anomalyZscore, aggHistogramEquidepth)
}

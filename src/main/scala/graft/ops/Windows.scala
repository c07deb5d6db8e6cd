package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, OSql, Q, Tables}

/** Window-function surface (SURVEY.md §2.2). All event-time windows
  * order by epoch-milliseconds (unix_millis / epoch_ms) rather than raw
  * timestamps: the parquet stores timestamp[ns], which Spark and DuckDB
  * truncate to µs identically, but emitting raw ts would hash-mismatch
  * (SURVEY.md §1.3). Every window has a unique total order (id tiebreak)
  * so lag/lead/row_number are engine-independent.
  *
  * Scale: a window partitioned by a high-cardinality key (user_id,
  * custkey) shuffles once on that key and sorts within partitions —
  * the same plan shape a 1000-executor cluster wants. Three keys run
  * (intentional) GLOBAL windows on bounded inputs — window_rank_dense
  * and window_percent_rank on the supplier dimension, window_moving_avg
  * on per-day pre-aggregates; each documents the single-partition bound
  * and the two-phase (range-partition + offset merge) spelling a 100×
  * input would need.
  */
object Windows {
  import Det._

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** Top-3 orders per market segment. The rank filter is written
    * declaratively (row_number ≤ 3 over a window) and Catalyst's
    * WindowGroupLimit rule turns it into the two-phase top-k plan:
    * a PARTIAL WindowGroupLimit before the exchange keeps ≤3 rows per
    * (segment, input-partition), so the shuffle and the final
    * 5-partition window only ever see ≤3×P candidate rows — the full
    * fact table is pruned map-side. Verified via `runMain graft.Explain
    * window_rank_topk`: Sort→WindowGroupLimit(partial)→Exchange→
    * WindowGroupLimit(final)→Window.
    */
  private val rankTopk = Q(
    "window_rank_topk",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_orderkey", $"o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"c_mktsegment", $"rn".cast("long").as("rn"), $"o_orderkey", $"o_totalprice")
        .orderBy("c_mktsegment", "rn")
    },
    Some("SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM " +
      "(SELECT c_mktsegment, o_orderkey, o_totalprice, row_number() OVER " +
      "(PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
      "FROM orders JOIN customer ON o_custkey = c_custkey) " +
      "WHERE rn <= 3 ORDER BY c_mktsegment, rn"))

  /** Global rank / dense_rank / ntile over the supplier DIMENSION.
    * `Window.orderBy` without partitionBy moves the whole input through
    * ONE partition (WindowExec warns) — correct here by construction:
    * the semantics are genuinely global and the input is a bounded
    * dimension table (10⁴ rows at sf1, not a fact stream). A 100×
    * supplier table would need the two-phase spelling instead:
    * range-partition by the sort key, rank within partitions, then add
    * per-partition offsets computed from partition counts (and for
    * dense_rank, distinct-value counts) — one extra tiny aggregate, no
    * single-partition sort. Documented bound, deliberate trade.
    */
  private val rankDense = Q(
    "window_rank_dense",
    (s, d) => {
      import s.implicits._
      val byBal = Window.orderBy($"s_acctbal".desc)
      val byBalKey = Window.orderBy($"s_acctbal".desc, $"s_suppkey".asc)
      t(s, d, "supplier")
        .select($"s_suppkey", $"s_acctbal",
          rank().over(byBal).cast("long").as("rnk"),
          dense_rank().over(byBal).cast("long").as("drnk"),
          ntile(4).over(byBalKey).cast("long").as("tile"))
        .orderBy("s_suppkey")
    },
    Some("SELECT s_suppkey, s_acctbal, " +
      "CAST(rank() OVER (ORDER BY s_acctbal DESC) AS BIGINT) AS rnk, " +
      "CAST(dense_rank() OVER (ORDER BY s_acctbal DESC) AS BIGINT) AS drnk, " +
      "CAST(ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS BIGINT) AS tile " +
      "FROM supplier ORDER BY s_suppkey"))

  private val lagLead = Q(
    "window_lag_lead",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms".asc, $"event_id".asc)
      Tables.events(s, d)
        .select($"user_id", $"event_id", $"value", $"ms")
        .select($"user_id", $"event_id",
          lag($"value", 1).over(w).as("prev_value"),
          (lead($"ms", 1).over(w) - $"ms").as("next_delta_ms"))
        .orderBy("user_id", "event_id")
    },
    Some("SELECT user_id, event_id, " +
      "lag(value) OVER w AS prev_value, " +
      "lead(epoch_ms(ts)) OVER w - epoch_ms(ts) AS next_delta_ms " +
      "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC) " +
      "ORDER BY user_id, event_id"))

  /** Running sum over a fully-ordered frame. The windowed sum runs in
    * DECIMAL in both engines (exact, so neither Spark's frame-order
    * accumulation nor DuckDB's segment-tree combination can drift),
    * then one cast to double + 2dp floor-round.
    */
  private val runningSum = Q(
    "window_running_sum",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          dround(sum($"o_totalprice".cast(Dec)).over(w).cast("double"), 2).as("cum_rev"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("SELECT o_custkey, o_orderkey, " +
      OSql.sround("CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate ASC, o_orderkey ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)", 2) +
      " AS cum_rev FROM orders ORDER BY o_custkey, o_orderkey"))

  /** First/last event per user. Not a window at all: `min_by`/`max_by`
    * keyed on the (ms, event_id) event-time order run as ONE partial +
    * final aggregate — the shuffle carries #users rows (vs the full
    * event table for a window + distinct), fully codegen'd.
    */
  private val firstLast = Q(
    "window_first_last",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id", $"event_id", $"event_type", $"ms")
        .groupBy($"user_id")
        .agg(
          min_by($"event_type", struct($"ms", $"event_id")).as("first_et"),
          max_by($"event_type", struct($"ms", $"event_id")).as("last_et"))
        .orderBy("user_id")
    },
    Some("SELECT DISTINCT user_id, " +
      "first_value(event_type) OVER w AS first_et, " +
      "last_value(event_type) OVER w AS last_et " +
      "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY user_id"))

  /** Range-frame window: 7-day moving average of daily event value over
    * epoch-day. Daily totals are summed EXACTLY in decimal first, so the
    * moving sum (≤7 decimal terms) is order-independent; only the final
    * divide happens in double, identically in both engines.
    *
    * The window itself is global (one row per DAY after the pre-agg, so
    * the single-partition WindowExec sees #days rows — bounded by the
    * calendar, not the corpus; the fact-table shuffle happens in the
    * partial+final daily aggregate, which scales normally). A
    * multi-year/multi-series variant would partitionBy(series) or
    * two-phase it: range-partition by day with a 6-day overlap fringe,
    * average within partitions, drop the fringe rows.
    */
  private val movingAvg = Q(
    "window_moving_avg",
    (s, d) => {
      import s.implicits._
      val daily = Tables.events(s, d)
        .groupBy(expr("ms div 86400000").cast("long").as("day"))
        .agg(sum($"value".cast(Dec)).as("v"), count(lit(1)).as("c"))
      val w = Window.orderBy($"day").rangeBetween(-6, 0)
      daily.select($"day",
        dround(sum($"v").over(w).cast("double") / count(lit(1)).over(w), 4).as("mavg7"))
        .orderBy("day")
    },
    Some("WITH dsum AS (SELECT epoch_ms(ts)//86400000 AS day, " +
      "SUM(CAST(value AS DECIMAL(20,6))) AS v, count(*) AS c FROM events GROUP BY 1) " +
      "SELECT CAST(day AS BIGINT) AS day, " +
      OSql.sround("CAST(SUM(v) OVER w AS DOUBLE) / COUNT(*) OVER w", 4) +
      " AS mavg7 FROM dsum WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) " +
      "ORDER BY day"))

  /** Distribution window functions (percent_rank, cume_dist): both are
    * pure rank arithmetic — (rank−1)/(n−1) and rank/n — identical in
    * both engines, rounded to 6dp. Runs on the supplier dimension (the
    * documented small-global-window pattern; never on fact tables —
    * same single-partition bound and two-phase alternative as
    * `window_rank_dense` above: global rank = within-partition rank +
    * range-partition offset, and n comes from one count).
    */
  private val percentRank = Q(
    "window_percent_rank",
    (s, d) => {
      import s.implicits._
      val w = Window.orderBy($"s_acctbal".desc, $"s_suppkey".asc)
      t(s, d, "supplier")
        .select($"s_suppkey", $"s_acctbal",
          dround(percent_rank().over(w), 6).as("prank"),
          dround(cume_dist().over(w), 6).as("cdist"))
        .orderBy("s_suppkey")
    },
    Some("SELECT s_suppkey, s_acctbal, " +
      OSql.sround("percent_rank() OVER w", 6) + " AS prank, " +
      OSql.sround("cume_dist() OVER w", 6) + " AS cdist " +
      "FROM supplier WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey ASC) " +
      "ORDER BY s_suppkey"))

  /** Bounded RANGE frame — the VALUE-bounded sibling of the row-counted
    * moving average: per event type, each day's trailing-3-day revenue
    * (`rangeBetween(-2, 0)` over the day number). ROWS and RANGE differ
    * exactly when the series has gaps or duplicate order values: a
    * 3-ROW frame would reach past a gap to older days, a 3-DAY range
    * frame never does — the semantics a calendar metric needs. Daily
    * totals pre-aggregate partial+final BEFORE the window (the shuffle
    * carries #days × #types rows, not events), the window partitions by
    * event_type (parallel across types, never single-partition), and
    * the decimal sums stay EXACT through both the pre-agg and the frame
    * sum — one rounding at the end, so frame-membership arithmetic is
    * integer and engine-identical.
    */
  private val rangeFrame = Q(
    "window_range_frame",
    (s, d) => {
      import s.implicits._
      val daily = Tables.events(s, d)
        .groupBy($"event_type", expr("ms div 86400000").cast("long").as("day"))
        .agg(sum($"value".cast(Dec)).as("vsum"))
      val w = Window.partitionBy($"event_type").orderBy($"day").rangeBetween(-2, 0)
      daily.select($"event_type", $"day",
          dround($"vsum".cast("double"), 2).as("day_value"),
          dround(sum($"vsum").over(w).cast("double"), 2).as("trail3"))
        .orderBy("event_type", "day")
    },
    Some("WITH dly AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day, " +
      "SUM(CAST(value AS DECIMAL(20,6))) AS vsum FROM events GROUP BY 1, 2) " +
      "SELECT event_type, day, " +
      OSql.sround("CAST(vsum AS DOUBLE)", 2) + " AS day_value, " +
      OSql.sround("CAST(SUM(vsum) OVER (PARTITION BY event_type ORDER BY day " +
        "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)", 2) + " AS trail3 " +
      "FROM dly ORDER BY 1, 2"))

  val qs: Seq[Q] = Seq(
    rankTopk, rankDense, lagLead, runningSum, firstLast, movingAvg, percentRank,
    rangeFrame)
}

package graft

/** Laws for the time-series / drift wave (TsOps): each test stages
  * crafted tables and runs the REAL `SparkEntry.queries` functions.
  */
class TsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000L
  private val D = 86400000L
  private val ns = (ms: Long) => ms * 1000000L

  private def ev(rows: Seq[(Long, Long, Long, String, Double, String)]) =
    rows.map { case (id, ms, u, t, v, p) => (id, ns(ms), u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  // ------------------------------------------------------ interpolation

  test("linear interpolation fills interior gaps exactly") {
    // observed $10 at hour 0 and $40 at hour 3 → hours 1, 2 fill to
    // $20, $30 (the exact lerp); spine is 4 hours, endpoints observed
    val rows = Seq(
      (1L, 0L, 1L, "t", 10.0, "{}"),
      (2L, 3 * H, 1L, "t", 40.0, "{}"))
    val r = run("ts_interpolate_linear", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 2L, 2L)))
    assert(r.getDouble(4) === 50.0)   // observed total
    assert(r.getDouble(5) === 50.0)   // 20 + 30 filled
  }

  test("a gapless series fills nothing") {
    val rows = (0 until 3).map(i => (i.toLong, i * H, 1L, "t", 5.0, "{}"))
    val r = run("ts_interpolate_linear", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(3) === 0L)
    assert(r.isNullAt(5))             // sum over zero fills
  }

  // ---------------------------------------------------- seasonal naive

  test("seasonal-naive forecasts the last day from prior same-hour means") {
    // hod 0: history 10, 10 → forecast 10; last-day actual 16 → MAE $6.
    // hod 1 exists ONLY on the last day → unscorable, excluded
    val rows = Seq(
      (1L, 0L, 1L, "t", 10.0, "{}"),
      (2L, D, 1L, "t", 10.0, "{}"),
      (3L, 2 * D, 1L, "t", 16.0, "{}"),
      (4L, 2 * D + H, 1L, "t", 99.0, "{}"))
    val r = run("ts_forecast_snaive", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 1L)
    assert(r.getDouble(2) === 16.0)
    assert(r.getDouble(3) === 6.0)
  }

  test("a perfect seasonal repeat scores zero MAE") {
    val rows = (0 until 3).flatMap(day => Seq(
      (day * 10L, day * D, 1L, "t", 25.0, "{}"),
      (day * 10L + 1, day * D + H, 1L, "t", 35.0, "{}")))
    val r = run("ts_forecast_snaive", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 2L && r.getDouble(3) === 0.0)
  }

  // -------------------------------------------------------------- PSI

  test("identical era distributions score exactly zero PSI") {
    // every value appears once per era → ca = cb in every bin
    val rows = Seq(10.0, 10.0, 60.0, 60.0, 120.0, 120.0).zipWithIndex.map {
      case (v, i) => (i.toLong, 1000L + i, 1L, "t", v, "{}") }
    val r = run("profile_drift_psi", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 3L && r.getLong(2) === 3L)
    assert(r.getDouble(3) === 0.0)
  }

  test("a shifted era distribution scores positive PSI") {
    // era 0 (even ids) all in bin 0; era 1 (odd ids) all in bin 2
    val rows = (0 until 20).map(i =>
      (i.toLong, 1000L + i, 1L, "t", if (i % 2 == 0) 10.0 else 120.0, "{}"))
    val r = run("profile_drift_psi", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getDouble(3) > 1.0)  // total separation is far past the 0.25 alarm
  }

  // ---------------------------------------------------- rolling median

  test("rolling median takes the lower middle of the trailing 5-frame") {
    // values 10, 90, 20 → medians 10 (singleton), 10 (lower of pair),
    // 20 (middle of three) — the spike at 90 never leaks through
    val rows = Seq(
      (1L, 1000L, 1L, "t", 10.0, "{}"),
      (2L, 2000L, 1L, "t", 90.0, "{}"),
      (3L, 3000L, 1L, "t", 20.0, "{}"))
    val got = run("window_median_rolling", stageTables("events" -> ev(rows)))
      .collect().map(_.getLong(4))
    assert(got.toSeq === Seq(1000L, 1000L, 2000L))
  }

  // --------------------------------------------------------- drawdown

  test("max drawdown measures the deepest peak-to-trough fall") {
    // flows +10, +20, −30, +40 (id 3 negates) → cum 10,30,0,40:
    // trough at 0 under the 30 peak → drawdown $30; final peak $40
    val rows = Seq(
      (1L, 0L, 1L, "t", 10.0, "{}"),
      (2L, H, 1L, "t", 20.0, "{}"),
      (3L, 2 * H, 1L, "t", 30.0, "{}"),
      (4L, 3 * H, 1L, "t", 40.0, "{}"))
    val r = run("window_drawdown", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 4L)
    assert(r.getDouble(2) === 40.0)
    assert(r.getDouble(3) === 30.0)
  }

  test("a monotone series never draws down") {
    val rows = Seq(1L, 2L, 4L, 5L).zipWithIndex.map { case (id, i) =>
      (id, i * H, 1L, "t", 10.0, "{}") }  // no id divisible by 3: all inflows
    val r = run("window_drawdown", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getDouble(3) === 0.0)
  }

  // ------------------------------------------------------ rolling slope

  test("rolling slope recovers a perfect $1/hour trend; a lone point is NULL") {
    val rows = (0 until 5).map(i =>
      (2L * i + 1, i * H, 1L, "t", 1.0 + i, "{}"))
    val got = run("window_rolling_slope", stageTables("events" -> ev(rows))).collect()
    assert(got(0).isNullAt(2))               // n = 1 → zero x-variance
    assert(got.last.getDouble(2) === 1.0)    // full 5-point frame
  }

  // ------------------------------------------------------------ CUSUM

  test("CUSUM locates a level shift at the last pre-shift hour") {
    // $10/hour for hours 0-4 then $20/hour for 5-9: |D_k| peaks at
    // k=5 (hour 4), magnitude n·25000 cents → $25 after /n
    val rows = (0 until 10).map(i =>
      (i.toLong, i * H, 1L, "t", if (i < 5) 10.0 else 20.0, "{}"))
    val r = run("window_cusum_change", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 10L)
    assert(r.getLong(2) === 4L)
    assert(r.getDouble(3) === 25.0)
  }

  // ----------------------------------------------------- interval union

  test("interval union counts overlaps once and gaps not at all") {
    // u1: windows [0,600k) ∪ [300k,900k) → 900k covered;
    // u2: [0,600k) and [2M,2.6M) disjoint → 1.2M
    val rows = Seq(
      (1L, 0L, 1L, "view", 1.0, "{}"),
      (2L, 300000L, 1L, "view", 1.0, "{}"),
      (3L, 0L, 2L, "view", 1.0, "{}"),
      (4L, 2000000L, 2L, "view", 1.0, "{}"))
    val got = run("interval_union_length", stageTables("events" -> ev(rows)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 900000L, 2L -> 1200000L))
  }

  test("a window nested inside a longer coverage adds nothing") {
    // second event 1s after the first: its window ends inside the
    // first's remaining span plus 1s — union is 601s, not 1200s
    val rows = Seq(
      (1L, 0L, 1L, "view", 1.0, "{}"),
      (2L, 1000L, 1L, "view", 1.0, "{}"))
    val r = run("interval_union_length", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(2) === 601000L)
  }

  // ---------------------------------------------------------- runs test

  test("runs test: alternation scores high positive z, a trend negative") {
    val rows = (0 until 6).map(i =>
      (i.toLong, i * H, 1L, "alt", if (i % 2 == 0) 10.0 else 20.0, "{}")) ++
      (0 until 4).map(i => (10L + i, i * H, 1L, "trend", 10.0 * (i + 1), "{}"))
    val got = run("stat_runs_test", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getString(0) -> r).toMap
    val alt = got("alt")
    assert((alt.getLong(1), alt.getLong(2), alt.getLong(3)) === ((3L, 3L, 6L)))
    assert(math.abs(alt.getDouble(4) - 1.825742) < 1e-5)
    val tr = got("trend")
    assert(tr.getLong(3) === 2L)
    assert(math.abs(tr.getDouble(4) - -1.224745) < 1e-5)
  }

  // ------------------------------------------------------------ growth

  test("period growth is (cur - prev)/prev with NULL on the first period") {
    val P = 2592000000L
    val rows = Seq(
      (1L, 0L, 1L, "t", 100.0, "{}"),
      (2L, P, 1L, "t", 150.0, "{}"))
    val got = run("window_mom_growth", stageTables("events" -> ev(rows))).collect()
    assert(got(0).isNullAt(3))
    assert(got(1).getDouble(3) === 0.5)
  }

  // ------------------------------------------------------ autocorr lag1

  test("lag-1 autocorrelation: alternation scores -1, a line scores +1") {
    val rows = (0 until 6).map(i =>
      (i.toLong, i * H, 1L, "alt", if (i % 2 == 0) 10.0 else 20.0, "{}")) ++
      (0 until 6).map(i => (10L + i, i * H, 1L, "line", 10.0 * (i + 1), "{}"))
    val got = run("agg_autocorr_lag1", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("alt") === -1.0)
    assert(got("line") === 1.0)
  }

  test("lag-1 autocorrelation of a constant series is NULL, not NaN") {
    val rows = (0 until 4).map(i => (i.toLong, i * H, 1L, "t", 5.0, "{}"))
    val r = run("agg_autocorr_lag1", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.isNullAt(2))
  }

  // ---------------------------------------------------------- entropy

  test("entropy: one hour bucket scores 0, a uniform pair scores exactly 1 bit") {
    val rows = Seq(
      (1L, 0L, 1L, "one", 1.0, "{}"),
      (2L, 60000L, 1L, "one", 1.0, "{}"),
      (3L, 0L, 1L, "two", 1.0, "{}"), (4L, 1000L, 1L, "two", 1.0, "{}"),
      (5L, H, 1L, "two", 1.0, "{}"), (6L, H + 1000L, 1L, "two", 1.0, "{}"))
    val got = run("agg_entropy", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("one") === ((1L, 2L, 0.0)))
    assert(got("two") === ((2L, 4L, 1.0)))
  }

  test("CUSUM changepoint lands exactly on a planted level shift") {
    // $1/hour for hours 0-5, $5/hour for 6-11 → the excursion
    // |n·S1 − k·S| peaks at k = 6, i.e. split after hour 5
    val rows = (0 until 12).map(i =>
      (i.toLong, i * H, 1L, "t", if (i < 6) 1.0 else 5.0, "{}"))
    val r = run("ts_changepoint_cusum", stageTables("events" -> ev(rows)))
      .collect()(0)
    assert((r.getLong(1), r.getLong(2)) === ((12L, 5L)))
    assert((r.getLong(3), r.getLong(4)) === ((6L, 6L)))
    assert((r.getDouble(5), r.getDouble(6)) === ((1.0, 5.0)))
  }

  test("ACF correlogram: a period-2 alternation scores +1 on even lags, -1 on odd") {
    val rows = (0 until 30).map(i =>
      (i.toLong, i * H, 1L, "t", if (i % 2 == 0) 1.0 else 3.0, "{}"))
    val got = run("ts_acf_lags", stageTables("events" -> ev(rows)))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got(2L) === 1.0 && got(6L) === 1.0 && got(12L) === 1.0
      && got(24L) === 1.0)
    assert(got(3L) === -1.0)
  }

  test("Theil-Sen slope shrugs off a planted outlier day") {
    val D = 86400000L
    // days 0..8 on the exact line 100 + 7·day cents; day 9 is a wild
    // outlier: 36 of the 45 pairwise slopes are exactly 7 cents/day,
    // so the lower median (23rd of 45) stays on the line
    val rows = (0 until 9).map(i =>
      (i.toLong, i * D, 1L, "t", 1.00 + 0.07 * i, "{}")) :+
      (9L, 9 * D, 1L, "t", 10000.0, "{}")
    val r = run("ts_theil_sen", stageTables("events" -> ev(rows)))
      .collect()(0)
    assert((r.getLong(1), r.getLong(2)) === ((10L, 45L)))
    assert(r.getDouble(3) === 7.0)
  }

  test("Holt fold: a clean linear ramp tracks level and trend exactly") {
    val D = 86400000L
    // y = 10.00, 12.00, 14.00 dollars on days 0,1,2: init l=1,000,000
    // b=200,000 milli-cents; the one fold step gives l=1,300,000,
    // b=250,000, forecast l+b=1,550,000 — all exact integers
    val rows = Seq((0L, 0L, 1L, "t", 10.0, "{}"),
      (1L, D, 1L, "t", 12.0, "{}"), (2L, 2 * D, 1L, "t", 14.0, "{}"),
      (3L, 0L, 1L, "solo", 5.0, "{}")) // single-day type: excluded
    val r = run("ts_holt_forecast", stageTables("events" -> ev(rows)))
      .collect()
    assert(r.length === 1 && r(0).getString(0) === "t")
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4)) === ((3L, 1300000L, 250000L, 1550000L)))
  }

  // ----------------------------------------------------------- hampel

  test("Hampel flags exactly the planted spike; a flat series flags nothing") {
    // hours 0..6 at $1, hour 3 spikes to $100: the ±2h window around
    // the spike has median 100¢ / MAD 0, so only hour 3 trips the
    // 3·MAD fence (9900¢ > 0); its flat neighbors sit at dev 0
    val rows = (0 until 7).map(i =>
      (i.toLong, i * H, 1L, "t", if (i == 3) 100.0 else 1.0, "{}"))
    val r = run("ts_hampel_outliers", stageTables("events" -> ev(rows)))
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((7L, 1L, 9900L)))
    // constant series: every deviation 0 → no outliers, NULL worst-dev
    val flat = (0 until 5).map(i => (i.toLong, i * H, 1L, "t", 2.0, "{}"))
    val r2 = run("ts_hampel_outliers", stageTables("events" -> ev(flat)))
      .collect()(0)
    assert((r2.getLong(1), r2.getLong(2)) === ((5L, 0L)))
    assert(r2.isNullAt(3))
  }
}

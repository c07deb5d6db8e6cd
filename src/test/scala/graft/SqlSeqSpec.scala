package graft

import org.apache.spark.sql.functions._

/** Laws and plan pins for the round-9 families: the SQL subquery surface
  * (decorrelation shapes, NOT IN three-valued logic, multiset set-op
  * semantics) and the ordered-sequence analytics (island reconstruction,
  * Markov row-stochasticity, sweep-line concurrency vs brute force,
  * equi-depth balance, z-score flagging). All tests drive the REAL
  * `SparkEntry.queries` functions.
  */
class SqlSeqSpec extends SparkSpec {
  import spark.implicits._

  private def executedPlan(key: String): String = {
    val df = run(key)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private val ns = (ms: Long) => ms * 1000000L

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.map { case (id, ms, u, et, v) => (id, ns(ms), u, et, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  // ------------------------------------------------------ decorrelation

  test("subquery_exists decorrelates to a semi join — no per-row re-execution") {
    val plan = executedPlan("subquery_exists")
    assert(plan.contains("LeftSemi"), "EXISTS must plan as a left-semi join")
    assert(!plan.contains("CartesianProduct"))
  }

  test("subquery_not_in plans as a null-aware anti join") {
    val plan = executedPlan("subquery_not_in")
    assert(plan.contains("LeftAnti"), "NOT IN must plan as an anti join")
  }

  test("NOT IN three-valued logic: one NULL in the inner set empties the result") {
    val part = Seq((1L, "B1"), (2L, "B2"), (3L, "B3"))
      .toDF("p_partkey", "p_brand")
    val liNoNull = Seq((Some(1L), 50.0), (Some(9L), 50.0))
      .toDF("l_partkey", "l_quantity")
    val liNull = Seq((Some(1L), 50.0), (None: Option[Long], 50.0))
      .toDF("l_partkey", "l_quantity")
    val without = run("subquery_not_in",
      stageTables("part" -> part, "lineitem" -> liNoNull)).collect()
    assert(without.map(_.getLong(0)).toSeq === Seq(2L, 3L),
      "non-null inner: plain anti-join semantics")
    val withNull = run("subquery_not_in",
      stageTables("part" -> part, "lineitem" -> liNull)).collect()
    assert(withNull.isEmpty,
      "a NULL in the inner set makes every NOT IN comparison UNKNOWN")
  }

  test("join_lateral_topk pushes the per-group limit map-side (WindowGroupLimit)") {
    val plan = executedPlan("join_lateral_topk")
    assert(plan.contains("WindowGroupLimit"),
      "LATERAL ... LIMIT must become rank-based group-limit pushdown")
    assert(plan.contains("BroadcastHashJoin"),
      "the nation side must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("lateral top-2 returns at most two customers per nation, richest first") {
    val rows = run("join_lateral_topk").collect()
    val byNation = rows.groupBy(_.getString(0))
    assert(byNation.values.forall(_.length <= 2))
    byNation.values.foreach { g =>
      val bals = g.map(_.getDouble(2)).toSeq
      assert(bals === bals.sortBy(-(_: Double))) // desc within nation
    }
  }

  // ------------------------------------------------------ multiset ops

  test("INTERSECT ALL / EXCEPT ALL keep bag multiplicities min(m,n) and m-n") {
    val cust = Seq(1, 1, 1, 2).map(k => (k.toLong, k))
      .toDF("c_custkey", "c_nationkey")
    val supp = Seq(1, 1, 3).map(k => (k.toLong, k))
      .toDF("s_suppkey", "s_nationkey")
    val dir = stageTables("customer" -> cust, "supplier" -> supp)
    val inter = run("set_intersect_all", dir).collect().map(_.getLong(0)).toSeq
    assert(inter === Seq(1L, 1L), "min(3,2) copies of 1, zero copies of 2/3")
    val except = run("set_except_all", dir).collect().map(_.getLong(0)).toSeq
    assert(except === Seq(1L, 2L), "3-2 copies of 1, 1-0 copies of 2")
  }

  // ------------------------------------------------------ sequence laws

  test("seq_gap_islands reconstructs the stream: run lengths conserve events, runs alternate") {
    val rows = run("seq_gap_islands").collect()
    val total = rows.map(_.getLong(3)).sum
    val nEvents = graft.core.Tables.events(spark, sf).count()
    assert(total === nEvents, "every event belongs to exactly one island")
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val ordered = g.sortBy(_.getLong(1)) // by island id
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(2) !== b.getString(2),
            "adjacent islands of one user must differ in event_type")
        case _ => ()
      }
      // islands are time-disjoint and ordered
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) <= b.getLong(4))
        case _ => ()
      }
    }
  }

  test("markov_transitions rows are probability-normalized per prev state") {
    val rows = run("markov_transitions").collect()
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val p = g.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"row prob sum $p")
    }
  }

  test("interval_concurrency equals the brute-force sweep on crafted overlaps") {
    // user/value irrelevant; intervals [0,30s): events at 0s,10s,20s,40s
    // → at t=20s three intervals overlap; the 40s one never joins them.
    val dir = stageTables("events" -> eventsDf(Seq(
      (1L, 0L, 1L, "a", 0.0),
      (2L, 10000L, 1L, "a", 0.0),
      (3L, 20000L, 1L, "a", 0.0),
      (4L, 40000L, 1L, "a", 0.0))))
    val r = run("interval_concurrency", dir).collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 3L, "peak = three overlapping intervals")
    assert(r(0).getLong(1) === 20000L, "peak first reached at the third start")
  }

  test("interval_concurrency half-open boundary: end at t frees the slot before a start at t") {
    val dir = stageTables("events" -> eventsDf(Seq(
      (1L, 0L, 1L, "a", 0.0),
      (2L, 30000L, 1L, "a", 0.0)))) // starts exactly as #1 expires
    val r = run("interval_concurrency", dir).collect()
    assert(r(0).getLong(0) === 1L, "[0,30000) and [30000,60000) never overlap")
  }

  test("interval_concurrency has no single-partition window (two-phase sweep)") {
    val df = run("interval_concurrency")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // every WindowExec line must carry the pid partition spec
    plan.linesIterator.filter(_.contains("Window [")).foreach { l =>
      assert(l.contains("pid"), s"global window leaked into the sweep: $l")
    }
  }

  test("agg_histogram_equidepth buckets are depth-balanced and value-ordered") {
    val rows = run("agg_histogram_equidepth").collect()
    assert(rows.length === 8)
    val cnts = rows.map(_.getLong(1))
    assert(cnts.max - cnts.min <= 1, "equi-depth: counts differ by at most 1")
    // bucket value ranges must not overlap (boundaries may touch on ties)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2))
      case _ => ()
    }
  }

  test("anomaly_zscore flags the planted outlier and only |z| > 3 rows") {
    val base = (1L to 40L).map(i => (i, i * 1000L, 1L, "m", 10.0 + (i % 3)))
    val dir = stageTables("events" ->
      eventsDf(base :+ (99L, 99000L, 1L, "m", 500.0)))
    val r = run("anomaly_zscore", dir).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(99L),
      "exactly the planted 500.0 among ~11s is > 3 sigma")
  }

  // ------------------------------------------------- curation additions

  test("text_lexical_diversity computes exact TTR and top-token share") {
    val docs = Seq((1L, "a a b", "en", "s1", 5L), (2L, "x y z", "en", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = run("text_lexical_diversity", stageTables("documents" -> docs))
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r(1L) === ((3L, 2L, 0.666667, 0.666667)))
    assert(r(2L) === ((3L, 3L, 1.0, 0.333333)))
  }

  test("scan_binary is a metadata-only read — file contents never deserialized") {
    val df = run("scan_binary")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("content"),
      "projecting only (source, length) must keep the binary payload unread")
  }

  test("funnel_time_to_convert only counts purchases after the first view") {
    val dir = stageTables("events" -> eventsDf(Seq(
      (1L, 1000L, 1L, "purchase", 0.0), // before any view: not a conversion
      (2L, 2000L, 1L, "view", 0.0),
      (3L, 2000L, 2L, "view", 0.0),
      (4L, 7000L, 2L, "purchase", 0.0), // 5s conversion
      (5L, 1000L, 3L, "view", 0.0)))) // never converts
    val r = run("funnel_time_to_convert", dir).collect()
    assert(r(0).getLong(0) === 1L, "only user 2 converts")
    assert(r(0).getLong(3) === 5000L)
  }

  test("abandonment splits sessions at the 30-minute gap and requires engagement") {
    val m = 60000L
    val dir = stageTables("events" -> eventsDf(Seq(
      // session 1: view → purchase (converted, span 1 min, 10.00)
      (1L, 0L, 1L, "view", 0.0),
      (2L, m, 1L, "purchase", 10.0),
      // session 2 (31 min later): click only → abandoned
      (3L, 32 * m, 1L, "click", 0.0),
      // user 2: error-only session → not engaged, excluded
      (4L, 0L, 2L, "error", 0.0))))
    val got = run("funnel_abandonment", dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "converted" -> ((1L, 2L, m, 1000L)),
      "abandoned" -> ((1L, 1L, 0L, 0L))))
  }

  test("longest streak bridges consecutive days and breaks on gaps") {
    val day = 86400000L
    val dir = stageTables("events" -> eventsDf(Seq(
      // user 1 active on days 1,2,3 then 7,8 → streak 3
      (1L, 1 * day, 1L, "view", 0.0), (2L, 2 * day, 1L, "view", 0.0),
      (3L, 2 * day + 5, 1L, "view", 0.0), // same-day dup collapses
      (4L, 3 * day, 1L, "view", 0.0),
      (5L, 7 * day, 1L, "view", 0.0), (6L, 8 * day, 1L, "view", 0.0),
      // user 2: single day → streak 1
      (7L, 5 * day, 2L, "view", 0.0))))
    val got = run("seq_streak_longest", dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 3L -> 1L))
  }

  test("inter-arrival percentiles are exact over integer gaps") {
    val dir = stageTables("events" -> eventsDf(Seq(
      (1L, 1000L, 1L, "view", 0.0),
      (2L, 1010L, 1L, "view", 0.0),   // delta 10
      (3L, 1030L, 1L, "view", 0.0),   // delta 20
      (4L, 1060L, 1L, "view", 0.0)))) // delta 30
    val r = run("seq_interarrival_stats", dir).collect()(0)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 20.0) // exact p50 of {10,20,30}
  }

  test("MAD outliers: a constant stream flags only the spike") {
    val dir = stageTables("events" -> eventsDf(
      Seq.tabulate(9)(i => (i.toLong, 1000L + i, 1L, "t", 10.0)) :+
        (9L, 5000L, 1L, "t", 100.0)))
    val r = run("anomaly_mad", dir).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 1L) // only the 100.00 spike
    assert(r(0).getLong(2) === 9L)
  }
  test("markov stationary: a two-state alternating chain settles at half/half") {
    // a,b,a,b,a,b: transitions a→b ×3 (p 1), b→a ×2 (p 1) — the
    // stationary vector is exactly (½, ½) and the fixed-point masses
    // never leak (every floor division is exact)
    val rows = (0 until 6).map(i =>
      (i.toLong, i.toLong * 1000, 1L, if (i % 2 == 0) "a" else "b", 0.0))
    val got = run("seq_markov_stationary",
      stageTables("events" -> eventsDf(rows)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got("a") === ((500000000000L, 0.5)))
    assert(got("b") === ((500000000000L, 0.5)))
  }
}

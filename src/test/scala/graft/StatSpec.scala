package graft

import org.apache.spark.sql.functions._

/** Laws for the distributional-profiling / attribution / snapshot-diff
  * wave (StatOps): each test stages crafted tables and runs the REAL
  * `SparkEntry.queries` functions on them.
  */
class StatSpec extends SparkSpec {
  import spark.implicits._

  private val ns = (ms: Long) => ms * 1000000L

  // ---------------------------------------------------- weighted median

  test("weighted median picks the first price whose running weight reaches half") {
    val li = Seq(
      ("A", 10.0, 1.0, 1L, 1), ("A", 20.0, 2.0, 1L, 2), ("A", 30.0, 1.0, 1L, 3),
      // unit weights: the lower median of {10,20,30,40} is 20
      ("B", 10.0, 1.0, 2L, 1), ("B", 20.0, 1.0, 2L, 2),
      ("B", 30.0, 1.0, 2L, 3), ("B", 40.0, 1.0, 2L, 4))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")
    val dir = stageTables("lineitem" -> li)
    val got = run("agg_weighted_median", dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // A: T=4, cum at 20 is 3, 2*3 >= 4 → 20
    assert(got === Map("A" -> ((4L, 20.0)), "B" -> ((4L, 20.0))))
  }

  test("weighted median: one heavy row dominates the group") {
    val li = Seq(
      ("A", 5.0, 10.0, 1L, 1), ("A", 50.0, 1.0, 1L, 2), ("A", 99.0, 1.0, 1L, 3))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")
    val dir = stageTables("lineitem" -> li)
    val r = run("agg_weighted_median", dir).collect()(0)
    assert(r.getDouble(2) === 5.0) // 2*10 >= 12 already at the first row
  }

  // ------------------------------------------------------ skew/kurtosis

  test("symmetric values have exactly zero skewness; uniform is platykurtic") {
    val ev = Seq.tabulate(9)(i =>
      (i.toLong, ns(1000L + i), 1L, "t", 1.0 + i, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val r = run("agg_skew_kurtosis", dir).collect()(0)
    assert(r.getLong(1) === 9L)
    assert(r.getDouble(2) === 5.0)       // mean of 1..9
    assert(r.getDouble(3) === 0.0)       // symmetric → zero third moment
    assert(r.getDouble(4) < 0.0)         // uniform → negative excess kurtosis
  }

  test("a zero-variance group yields NULL shape stats, not NaN") {
    val ev = Seq.tabulate(5)(i =>
      (i.toLong, ns(1000L + i), 1L, "t", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val r = run("agg_skew_kurtosis", dir).collect()(0)
    assert(r.getDouble(2) === 7.0)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("a right outlier produces positive skewness") {
    val vals = Seq(1.0, 1.0, 1.0, 1.0, 100.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, ns(1000L + i), 1L, "t", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val r = run("agg_skew_kurtosis", dir).collect()(0)
    assert(r.getDouble(3) > 1.0)
  }

  // ---------------------------------------------------------- cume_dist

  test("cume_dist: tied values share the through-last-peer fraction") {
    val ev = Seq(
      (1L, ns(1000), 1L, "t", 5.0, "{}"),
      (2L, ns(2000), 1L, "t", 5.0, "{}"),
      (3L, ns(3000), 1L, "t", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val got = run("window_cume_dist", dir).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got(1L) === got(2L))
    assert(math.abs(got(1L) - 2.0 / 3.0) < 1e-6)
    assert(got(3L) === 1.0)
  }

  // ------------------------------------------------------- degree stats

  test("degree histogram conserves the distinct user-day edge count") {
    val day = 86400000L
    val ev = Seq(
      (1L, ns(0L), 1L, "a", 1.0, "{}"),          // user 1, day 0
      (2L, ns(10L), 1L, "a", 1.0, "{}"),         // user 1, day 0 (dup edge)
      (3L, ns(day + 1), 1L, "a", 1.0, "{}"),     // user 1, day 1
      (4L, ns(2 * day), 2L, "a", 1.0, "{}"))     // user 2, day 2
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val rows = run("graph_degree_stats", dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1L -> 1L, 2L -> 1L)) // user2 degree 1, user1 degree 2
    val edges = rows.map { case (deg, n) => deg * n }.sum
    assert(edges === 3L) // distinct (user, day) pairs
  }

  // -------------------------------------------------------- first touch

  test("first-touch attribution credits each user's first channel") {
    val ev = Seq(
      (1L, ns(1000), 1L, "view", 0.0, "{}"),
      (2L, ns(2000), 1L, "purchase", 100.0, "{}"),
      (3L, ns(1000), 2L, "click", 0.0, "{}"),
      // user 3: purchase IS the first touch — credited to 'purchase'
      (4L, ns(500), 3L, "purchase", 40.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val got = run("seq_first_touch", dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(
      "view" -> ((1L, 1L, 100.0)),
      "click" -> ((1L, 0L, 0.0)),
      "purchase" -> ((1L, 1L, 40.0))))
  }

  test("first-touch user totals conserve the distinct-user count") {
    val rows = run("seq_first_touch").collect()
    val users = rows.map(_.getLong(1)).sum
    val expected = graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(users === expected)
  }

  // ------------------------------------------------------ snapshot diff

  test("snapshot diff classifies added / deleted / changed / unchanged") {
    // ms range [0, 100] → t1 = 50, t2 = 75
    val ev = Seq(
      (1L, ns(0L), 1L, "view", 1.0, "{}"),     // A: unchanged
      (2L, ns(60L), 2L, "view", 2.0, "{}"),    // B: added in (50,75]
      (3L, ns(10L), 3L, "view", 3.0, "{}"),    // C: present at t1 …
      (4L, ns(70L), 3L, "error", 3.0, "{}"),   // … tombstoned by t2 → deleted
      (5L, ns(10L), 4L, "view", 1.0, "{}"),    // D: changed (100 → 250 cents)
      (6L, ns(70L), 4L, "view", 2.5, "{}"),
      (7L, ns(100L), 5L, "view", 9.0, "{}"))   // E: first event after t2 → absent
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val got = run("cdc_snapshot_diff", dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "added" -> ((1L, 0L)),
      "deleted" -> ((1L, 0L)),
      "changed" -> ((1L, 150L)),
      "unchanged" -> ((1L, 0L))))
  }

  // ------------------------------------------------- temperature mixing

  test("temperature sampling flattens: equal sizes get equal shares") {
    val docs = Seq(
      (1L, "aa", "en", "s1", 100L), (2L, "bb", "en", "s1", 100L),
      (3L, "cc", "en", "s2", 200L),
      (4L, "dd", "en", "s3", 50L), (5L, "ee", "en", "s3", 150L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = stageTables("documents" -> docs)
    val got = run("sample_temperature", dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // all three domains have 200 chars → identical sqrt weights
    assert(got("s1") === got("s2"))
    assert(got("s2") === got("s3"))
    assert(math.abs(got.values.sum - 1.0) < 1e-5)
  }

  test("temperature sampling: sqrt compresses the size ratio") {
    val docs = Seq(
      (1L, "a", "en", "big", 10000L),
      (2L, "b", "en", "small", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = stageTables("documents" -> docs)
    val got = run("sample_temperature", dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // raw ratio 100:1 → sqrt ratio 10:1
    assert(math.abs(got("big") / got("small") - 10.0) < 1e-3)
  }

  // ------------------------------------------------------- dead letters

  // ------------------------------------------------- rolling z-score

  test("rolling z-score flags a spike against the trailing window only") {
    // 10 warm-up events at 1.00 (zero variance → excluded), then a spike
    val ev = (Seq.tabulate(10)(i =>
      (i.toLong, ns(1000L + i), 1L, "t", 1.0, "{}")) :+
      (10L, ns(2000L), 1L, "t", 100.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val rows = run("window_zscore_rolling", dir).collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(1) === 10L) // only the spike is flagged
    assert(rows(0).getDouble(4) > 2.0)
  }

  test("rolling z-score is silent on a constant stream") {
    val ev = Seq.tabulate(30)(i =>
      (i.toLong, ns(1000L + i), 1L, "t", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    assert(run("window_zscore_rolling", dir).collect().isEmpty)
  }

  // ---------------------------------------------------------- RFM

  test("RFM: monetary quartiles separate four users with equal R and F") {
    val ev = (1 to 4).flatMap { u =>
      Seq((u * 10L, ns(1000L), u.toLong, "t", 0.0, "{}"),
        (u * 10L + 1, ns(2000L), u.toLong, "t", u * 10.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val got = run("seq_rfm_score", dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    // same recency + frequency → score 1; m = 10..40 → scores 1..4
    assert(got === Map((1, 1, 1) -> 1L, (1, 1, 2) -> 1L,
      (1, 1, 3) -> 1L, (1, 1, 4) -> 1L))
  }

  test("RFM segment counts conserve the user population") {
    val rows = run("seq_rfm_score").collect()
    val users = graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(3)).sum === users)
  }

  // ------------------------------------------------ URL canonicalization

  test("all four URL noise variants collapse to one canonical key") {
    val docs = Seq(
      (0L, "x", "en", "s1", 1L), (1L, "x", "en", "s1", 1L),
      (2L, "x", "en", "s2", 1L), (3L, "x", "en", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = stageTables("documents" -> docs)
    val got = run("dedup_url_canonical", dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc pair (0,1) shares base 0 (scheme/case/slash noise), pair (2,3)
    // shares base 1 (?utm / #frag noise) — one keeper per pair
    assert(got === Map("s1" -> ((2L, 1L)), "s2" -> ((2L, 1L))))
  }

  test("URL dedup keeps exactly one doc per shared base") {
    val rows = run("dedup_url_canonical").collect()
    val docs = graft.core.Tables.t(spark, sf, "documents")
    val bases = docs.select(expr("doc_id div 2")).distinct().count()
    assert(rows.map(_.getLong(2)).sum === bases)
    assert(rows.map(_.getLong(1)).sum === docs.count())
  }

  // ----------------------------------------------------- Gini diversity

  test("Gini: single-type user scores 0, balanced two-type user 0.5") {
    val ev = Seq(
      (1L, ns(1000), 1L, "a", 0.0, "{}"), (2L, ns(2000), 1L, "a", 0.0, "{}"),
      (3L, ns(1000), 2L, "a", 0.0, "{}"), (4L, ns(2000), 2L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val got = run("agg_gini_diversity", dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === Map(1L -> 0.0, 2L -> 0.5))
  }

  // ---------------------------------------------------- windowed top-k

  test("windowed top-k ranks by count and breaks ties alphabetically") {
    val hr = 3600000L
    val ev = (Seq.fill(3)("c") ++ Seq.fill(2)("b") ++ Seq.fill(2)("a") ++
      Seq("z")).zipWithIndex.map { case (t, i) =>
      (i.toLong, ns(hr * 5 + i), 1L, t, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val rows = run("topk_windowed", dir).collect()
    assert(rows.length === 2)
    assert(rows(0).getString(1) === "c") // count 3
    assert(rows(1).getString(1) === "a") // 2-way tie at 2 → alphabetical
  }

  // ---------------------------------------------------- temporal join

  test("temporal dim join picks the tier in effect at purchase time") {
    val ev = Seq(
      (1L, ns(10L), 1L, "signup", 150.0, "{}"),   // tier 1, [10, 50)
      (2L, ns(50L), 1L, "error", 250.0, "{}"),    // tier 2, [50, ∞)
      (3L, ns(5L), 1L, "purchase", 1.0, "{}"),    // before any profile → -1
      (4L, ns(10L), 1L, "purchase", 2.0, "{}"),   // inclusive lower bound
      (5L, ns(49L), 1L, "purchase", 3.0, "{}"),   // still tier 1
      (6L, ns(50L), 1L, "purchase", 4.0, "{}"),   // exclusive upper → tier 2
      (7L, ns(100L), 1L, "purchase", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val got = run("join_temporal_dim", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(
      -1L -> ((1L, 1.0)),
      1L -> ((2L, 5.0)),
      2L -> ((2L, 9.0))))
  }

  // ------------------------------------------------------- parse_url

  test("parse_url components: case-folded host, query tag, fragment") {
    val docs = Seq(
      (0L, "x", "en", "s", 1L), (1L, "x", "en", "s", 1L),
      (2L, "x", "en", "s", 1L), (3L, "x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = stageTables("documents" -> docs)
    val got = run("scalar_url", dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // docs 0,1 → site0.com (one via SITE0.COM); 2 carries ?utm, 3 #frag
    assert(got === Map(
      "site0.com" -> ((2L, 0L, 0L)),
      "site1.com" -> ((2L, 1L, 1L))))
  }

  // ------------------------------------------------------- plan pins

  test("plan: RFM scoring never plans a WindowExec") {
    val plan = run("seq_rfm_score").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "broadcast-quantile scoring must not window")
  }

  test("plan: rolling z-score windows are keyed by user, never global") {
    val plan = run("window_zscore_rolling").queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(user_id"),
      "frame must hash-partition on user_id")
    assert(!plan.contains("SinglePartition"),
      "no single-partition window allowed")
  }

  test("plan: snapshot diff never joins the fact table back") {
    val plan = run("cdc_snapshot_diff").queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "state must come from one aggregate, not a join-back")
  }

  test("plan: temporal dim join stays an equi-join on user_id") {
    val plan = run("join_temporal_dim").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "interval check must ride a user_id equi-join, not a theta scan")
  }

  // ------------------------------------------------------------ EWMA

  test("EWMA of a constant stream is the constant, bit-exact") {
    val ev = Seq.tabulate(10)(i =>
      (i.toLong, ns(1000L + i), 1L, "t", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val rows = run("window_ewma", dir).collect()
    assert(rows.length === 3) // rows 8, 9, 10 have a full 8-tap frame
    assert(rows.forall(_.getDouble(2) === 2.0))
  }

  test("EWMA weights decay by exact powers of two") {
    // 7 zero events then a 1.00 spike: ewma = 1.00 / (255/128) = 128/255
    val ev = (Seq.tabulate(7)(i =>
      (i.toLong, ns(1000L + i), 1L, "t", 0.0, "{}")) :+
      (7L, ns(2000L), 1L, "t", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val rows = run("window_ewma", dir).collect()
    assert(rows.length === 1)
    assert(rows(0).getDouble(2) === 0.501961) // round6(128/255)
  }

  test("json dead-letter path nulls exactly the corrupted rows") {
    val ev = Seq.tabulate(21)(i =>
      (i.toLong, ns(1000L + i), 1L, "t", 0.0, s"""{"k": $i}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val r = run("scan_json_badrecords", dir).collect()(0)
    val corrupted = (0 until 21).count(_ % 7 == 0) // 0, 7, 14
    assert(r.getLong(1) === 21L)
    assert(r.getLong(3) === corrupted.toLong)
    assert(r.getLong(2) === (21 - corrupted).toLong)
    // k_sum = Σ k over the surviving rows only
    val expectedK = (0 until 21).filter(_ % 7 != 0).sum
    assert(r.getLong(4) === expectedK.toLong)
  }
}

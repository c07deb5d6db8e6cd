package graft

/** Laws for the SQL-surface completions (right outer join, explicit
  * null ordering, Pareto concentration): crafted tables through the
  * REAL query functions.
  */
class SurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val ns = (ms: Long) => ms * 1000000L

  test("right outer join preserves customers with no orders") {
    val orders = Seq((10L, 1L, "F", 100.0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val customer = Seq(
      (1L, "A", 10L, 5.0), (2L, "B", 11L, 6.0))
      .toDF("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
    val got = run("join_right_outer",
      stageTables("orders" -> orders, "customer" -> customer)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(got("A") === ((1L, 1L, 100.0)))
    assert(got("B") === ((1L, 0L, 0.0)))   // preserved, unmatched, zero-filled
  }

  test("explicit NULLS FIRST puts the error rows ahead of every value") {
    val rows = Seq(
      (1L, ns(1000), 1L, "view", 5.0, "{}"),
      (2L, ns(2000), 1L, "error", 9.0, "{}"),
      (3L, ns(3000), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = run("sort_null_order", stageTables("events" -> rows)).collect()
    assert(got(0).getLong(0) === 2L && got(0).isNullAt(1))
    assert(got.drop(1).map(_.getDouble(1)).toSeq === Seq(1.0, 5.0))
  }

  test("Pareto: one whale covering 80% makes k80 = 1") {
    // cust 1 books 80 of the 100 total; ten minnows book 2 each
    val orders = (Seq((100L, 1L, 80.0)) ++ (2 to 11).map(c =>
      (100L + c, c.toLong, 2.0)))
      .map { case (ok, ck, v) => (ok, ck, "F", v, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val customer = (1 to 11).map(c => (c.toLong, "A", 10L, 5.0))
      .toDF("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
    val r = run("window_pareto_80",
      stageTables("orders" -> orders, "customer" -> customer)).collect()(0)
    assert((r.getLong(1), r.getLong(2)) === ((11L, 1L)))
    assert(r.getDouble(3) === 0.090909)
  }

  test("calendar arithmetic clamps month-relative dates") {
    // Jan 31 + 1 month lands on leap-year Feb 29, not an invalid Feb 31
    val ts = java.sql.Timestamp.valueOf("2024-01-31 00:00:00")
    val orders = Seq((1L, 1L, "F", 10.0, ts, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = run("scalar_calendar", stageTables("orders" -> orders)).collect()(0)
    assert(r.getString(1) === "2024-02-29")
    assert(r.getString(2) === "2024-01-31")
    assert(r.getLong(3) === 1L)   // Q1
    assert(r.getLong(4) === 0L)   // already at end of month
  }

  test("geometric mean of {1, 100} is exactly 10") {
    val ns = (ms: Long) => ms * 1000000L
    val rows = Seq(
      (1L, ns(1000), 1L, "t", 1.0, "{}"),
      (2L, ns(2000), 1L, "t", 100.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = run("agg_geomean", stageTables("events" -> rows)).collect()(0)
    assert(r.getLong(1) === 2L && r.getDouble(2) === 10.0)
  }

  test("Mann-Kendall: monotone series scores S = n(n-1)/2; constants are NULL") {
    val ns = (ms: Long) => ms * 1000000L
    val H = 3600000L
    val rows = (0 until 5).map(i =>
      (i.toLong, ns(i * H), 1L, "up", 1.0 + i, "{}")) ++ (0 until 5).map(i =>
      (10L + i, ns(i * H), 1L, "flat", 7.0, "{}"))
    val got = run("stat_trend_mann_kendall",
      stageTables("events" -> rows.toDF(
        "event_id", "ts", "user_id", "event_type", "value", "props"))).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("up").getLong(2) === 10L)
    assert(got("up").getDouble(3) > 2.2 && got("up").getDouble(3) < 2.21)
    assert(got("flat").getLong(2) === 0L && got("flat").isNullAt(3))
  }

  test("HHI: a duopoly scores 0.5, a monopoly 1.0") {
    val orders = Seq(
      (1L, 1L, "F", 50.0, "1-URGENT"), (2L, 2L, "F", 50.0, "1-URGENT"),
      (3L, 3L, "F", 80.0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val customer = Seq(
      (1L, "DUO", 10L, 5.0), (2L, "DUO", 10L, 5.0), (3L, "MONO", 10L, 5.0))
      .toDF("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
    val got = run("agg_hhi",
      stageTables("orders" -> orders, "customer" -> customer)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("DUO") === ((2L, 0.5, 2.0)))
    assert(got("MONO") === ((1L, 1.0, 1.0)))
  }

  test("Gini: equal customers score 0; concentration pushes toward 1") {
    // EQ: four equal customers → G = 0 exactly;
    // SKEW: 1,1,1,97 → G = 2·(1+2+3+4·97)/(4·100) − 5/4 = 0.72
    val orders = ((1 to 4).map(c => (100L + c, c.toLong, 10.0)) ++
      Seq((200L, 11L, 1.0), (201L, 12L, 1.0), (202L, 13L, 1.0),
        (203L, 14L, 97.0)))
      .map { case (ok, ck, v) => (ok, ck, "F", v, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val customer = ((1 to 4).map(c => (c.toLong, "EQ")) ++
      (11 to 14).map(c => (c.toLong, "SKEW")))
      .map { case (ck, seg) => (ck, seg, 10L, 5.0) }
      .toDF("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
    val got = run("agg_gini_revenue",
      stageTables("orders" -> orders, "customer" -> customer)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("EQ") === 0.0)
    assert(got("SKEW") === 0.72)
  }

  test("readability counts sentences on terminal-punctuation runs") {
    val docs = Seq(
      // 2 sentences, 4 words → 2 words/sentence
      (1L, "one two. three four!", "en", "s0", 20L),
      // "..." collapses to one boundary; 1 sentence, 3 words
      (2L, "wait for it...", "fr", "s0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = run("text_readability", stageTables("documents" -> docs)).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got("en") === ((2L, 2.0)))
    assert(got("fr") === ((1L, 3.0)))
  }

  test("Pareto: a uniform segment needs 80% of its customers") {
    val orders = (1 to 10).map(c => (100L + c, c.toLong, "F", 10.0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val customer = (1 to 10).map(c => (c.toLong, "A", 10L, 5.0))
      .toDF("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
    val r = run("window_pareto_80",
      stageTables("orders" -> orders, "customer" -> customer)).collect()(0)
    assert(r.getLong(2) === 8L)   // 8 of 10 equal customers reach 80%
  }
}

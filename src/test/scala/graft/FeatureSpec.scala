package graft

import org.apache.spark.sql.functions._

/** Laws for the feature-engineering wave (FeatureOps): each test stages
  * crafted tables and runs the REAL `SparkEntry.queries` functions.
  */
class FeatureSpec extends SparkSpec {
  import spark.implicits._

  private val ns = (ms: Long) => ms * 1000000L

  test("WoE/IV separates purchase-heavy buckets; totals match the closed form") {
    // bucket0 (<$25): 2 purchases + 1 other; bucket1: 1 + 1. G=3, B=2.
    // woe0 = ln(2·2/(1·3)) = 0.287682; woe1 = ln(1·2/(1·3)) = −0.405465;
    // IV = (2/3−1/2)·woe0 + (1/3−1/2)·woe1 = 0.115525
    val rows = Seq(
      (1L, 1000L, 1L, "purchase", 10.0), (2L, 1001L, 1L, "purchase", 20.0),
      (3L, 1002L, 1L, "view", 15.0),
      (4L, 1003L, 1L, "purchase", 30.0), (5L, 1004L, 1L, "view", 40.0))
      .map { case (id, ms, u, t, v) => (id, ns(ms), u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = run("feature_woe_iv", stageTables("events" -> rows)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0L) === ((2L, 1L, 0.287682, 0.115525)))
    assert(got(1L) === ((1L, 1L, -0.405465, 0.115525)))
  }

  test("WoE/IV: a zero-cell bucket emits NULL WoE and adds nothing to IV") {
    // bucket0 is purchase-only → NULL woe, 0 IV term; bucket1 carries
    // the whole IV: (1/2 − 1/1)·ln(1·1/(1·2)) = 0.5·ln2 = 0.346574
    val rows = Seq(
      (1L, 1000L, 1L, "purchase", 10.0),
      (2L, 1001L, 1L, "purchase", 30.0), (3L, 1002L, 1L, "view", 40.0))
      .map { case (id, ms, u, t, v) => (id, ns(ms), u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = run("feature_woe_iv", stageTables("events" -> rows)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).isNullAt(3))
    assert(got(0L).getDouble(4) === 0.346574)
    assert(got(1L).getDouble(3) === -0.693147)
  }

  test("binning transfer learns quartiles on era 0 and applies them to era 1") {
    // train (even ids): 10,20,30,40 dollars -> edges 1000/2000/3000 cents;
    // serve (odd ids): 5,15,25,35 land one per bin
    val rows = Seq(
      (2L, 1000L, 1L, "t", 10.0), (4L, 1001L, 1L, "t", 20.0),
      (6L, 1002L, 1L, "t", 30.0), (8L, 1003L, 1L, "t", 40.0),
      (1L, 2000L, 1L, "t", 5.0), (3L, 2001L, 1L, "t", 15.0),
      (5L, 2002L, 1L, "t", 25.0), (7L, 2003L, 1L, "t", 35.0))
      .map { case (id, ms, u, t, v) => (id, ns(ms), u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = run("feature_binning_transfer", stageTables("events" -> rows))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 1L, 500L), (1L, 1L, 1500L), (2L, 1L, 2500L), (3L, 1L, 3500L)))
  }

  test("binning transfer never recomputes edges on the serving era") {
    // the serving era is wildly shifted - every serving row lands in the
    // TOP training bin instead of re-binning uniformly
    val rows = (Seq.tabulate(4)(i => (2L * i + 2, 1000L + i, 1L, "t", 10.0 + i)) ++
      Seq.tabulate(4)(i => (2L * i + 1, 2000L + i, 1L, "t", 900.0 + i)))
      .map { case (id, ms, u, t, v) => (id, ns(ms), u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = run("feature_binning_transfer", stageTables("events" -> rows))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((3L, 4L)))
  }

  test("OLS recovers exact coefficients from perfectly linear data") {
    // y = 5 + 2·quantity + 30·discount, non-collinear design
    val pts = Seq((1.0, 0.0), (2.0, 0.0), (1.0, 0.1), (2.0, 0.1), (3.0, 0.05))
    val li = pts.zipWithIndex.map { case ((x1, x2), i) =>
      ("A", x1, x2, 5.0 + 2.0 * x1 + 30.0 * x2, i.toLong, i) }
      .toDF("l_returnflag", "l_quantity", "l_discount",
        "l_extendedprice", "l_orderkey", "l_linenumber")
    val dir = stageTables("lineitem" -> li)
    val r = run("agg_ols2", dir).collect()(0)
    assert(r.getLong(1) === 5L)
    assert(r.getDouble(2) === 2.0)   // beta_quantity
    assert(r.getDouble(3) === 30.0)  // beta_discount
    assert(r.getDouble(4) === 5.0)   // intercept
  }

  test("OLS on a degenerate (constant-feature) design yields NULL betas, not NaN") {
    // discount identically zero → a22 = n·Σx2² − (Σx2)² is EXACTLY 0
    // → singular → guarded NULLs (a merely-constant nonzero feature
    // leaves a ~1e-17 float residue — deterministic in both engines,
    // but not the exact zero the guard is for)
    val li = (1 to 4).map(i =>
      ("A", i.toDouble, 0.0, 100.0 * i, i.toLong, i))
      .toDF("l_returnflag", "l_quantity", "l_discount",
        "l_extendedprice", "l_orderkey", "l_linenumber")
    val dir = stageTables("lineitem" -> li)
    val r = run("agg_ols2", dir).collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("min-max scaling maps extrema to 0 and 1, excludes constant keys") {
    val ev = Seq(
      (1L, ns(1000), 1L, "a", 1.0, "{}"),
      (2L, ns(2000), 1L, "a", 2.0, "{}"),
      (3L, ns(3000), 1L, "a", 3.0, "{}"),
      (4L, ns(1000), 1L, "flat", 9.0, "{}"),
      (5L, ns(2000), 1L, "flat", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val rows = run("feature_minmax_scale", dir).collect()
    val got = rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got === Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0))
    assert(!rows.exists(_.getString(0) == "flat")) // zero range excluded
  }

  test("hashing trick conserves token mass and routes by md5 prefix") {
    val docs = Seq(
      (1L, "spark spark flink", "en", "s", 1L),
      (2L, "spark duck", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = stageTables("documents" -> docs)
    val rows = run("text_hashing_trick", dir).collect()
    assert(rows.map(_.getLong(1)).sum === 5L) // total tokens conserved
    // 'spark' lands in the bucket of its md5 prefix, with 3 occurrences
    val sparkBucket = spark.sql("SELECT substring(md5('spark'), 1, 2)")
      .collect()(0).getString(0)
    val b = rows.find(_.getString(0) == sparkBucket).get
    assert(b.getLong(1) >= 3L)
  }

  test("bitmap distinct: hour masks OR together and popcount the domain") {
    val hr = 3600000L
    val ev = Seq(
      (1L, ns(0L), 1L, "t", 0.0, "{}"),          // hour 0 → bit 1
      (2L, ns(2 * hr), 1L, "t", 0.0, "{}"),      // hour 2 → bit 4
      (3L, ns(2 * hr + 5), 1L, "t", 0.0, "{}"),  // dup hour, same bit
      (4L, ns(25 * hr), 2L, "t", 0.0, "{}"))     // hour 25 ≡ 1 → bit 2
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val got = run("agg_bitmap_distinct", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      5L -> ((2L, 1L)),   // hours {0,2}
      2L -> ((1L, 1L))))  // hour {1}
  }

  test("linear attribution splits purchase value equally over prior touches") {
    val ev = Seq(
      (1L, ns(1000), 1L, "view", 0.0, "{}"),
      (2L, ns(2000), 1L, "click", 0.0, "{}"),
      (3L, ns(3000), 1L, "purchase", 10.0, "{}"),
      // user 2: purchase with NO prior touch → excluded entirely
      (4L, ns(1000), 2L, "purchase", 99.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val got = run("seq_attribution_linear", dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(
      "view" -> ((1L, 5.0)),
      "click" -> ((1L, 5.0))))
  }

  test("time-decay attribution halves a touch's claim per day of age") {
    val D = 86400000L
    val ev = Seq(
      // user 1: view 1 day before purchase (w=2^29), click same-day
      // (w=2^30) → shares 1/3 and 2/3 of $1.00
      (1L, ns(0), 1L, "view", 0.0, "{}"),
      (2L, ns(D), 1L, "click", 0.0, "{}"),
      (3L, ns(D + 1000), 1L, "purchase", 1.0, "{}"),
      // user 2: single fresh touch takes full credit
      (4L, ns(1000), 2L, "view", 0.0, "{}"),
      (5L, ns(2000), 2L, "purchase", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = run("seq_attribution_time_decay", stageTables("events" -> ev))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("click") === ((1L, 0.6667)))
    assert(got("view") === ((2L, 2.3333))) // 1/3 of $1 + all of $2
  }

  test("chunk-stitch round trip is lossless and counts ceil(n/64) chunks") {
    val long = (1 to 130).map(i => s"w$i").mkString(" ") // 130 tokens → 3 chunks
    val docs = Seq((1L, long, "en", "s", 1L), (2L, "solo", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = stageTables("documents" -> docs)
    val r = run("corpus_chunk_stitch", dir).collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 2L) // both stitched back byte-identical
    assert(r.getLong(2) === 4L) // 3 + 1 chunks
  }

  test("log2 histogram buckets are exact at powers of two") {
    val ev = Seq(
      (1L, ns(1000), 1L, "t", 0.01, "{}"),  // v=1    → bucket 1
      (2L, ns(2000), 1L, "t", 0.02, "{}"),  // v=2    → bucket 2
      (3L, ns(3000), 1L, "t", 0.03, "{}"),  // v=3    → bucket 2
      (4L, ns(4000), 1L, "t", 0.04, "{}"),  // v=4    → bucket 3
      (5L, ns(5000), 1L, "t", 10.24, "{}")) // v=1024 → bucket 11
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val got = run("agg_histogram_log2", dir).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 11L -> 1L))
  }

  test("BPE pair mining counts overlapping character bigrams") {
    val docs = Seq((1L, "aaab aa", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = stageTables("documents" -> docs)
    val rows = run("tokenizer_bpe_pairs", dir).collect()
    assert(rows(0).getString(0) === "aa") // 2 in 'aaab' + 1 in 'aa'
    assert(rows(0).getLong(1) === 3L)
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("aa" -> 3L, "ab" -> 1L))
  }

  test("perplexity bands separate common-token from rare-token docs") {
    val docs = Seq(
      (1L, "x x x x", "en", "s", 7L), // ln(4/5) ≈ −0.223 → band −1
      (2L, "q", "en", "s", 1L))       // ln(1/5) ≈ −1.609 → band −4
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = stageTables("documents" -> docs)
    val got = run("corpus_perplexity_filter", dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(-1L -> ((1, 1L, 4L)), -4L -> ((1, 1L, 1L))))
  }

  test("trigram path mining counts overlapping windows in stream order") {
    val types = Seq("a", "b", "c", "a", "b", "c")
    val ev = types.zipWithIndex.map { case (t, i) =>
      (i.toLong, ns(1000L + i), 1L, t, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = stageTables("events" -> ev)
    val rows = run("seq_trigram_paths", dir).collect()
    assert(rows(0).getString(0) === "a>b>c")
    assert(rows(0).getLong(1) === 2L)
    assert(rows.map(_.getLong(1)).sum === 4L) // n − 2 trigrams total
  }
}

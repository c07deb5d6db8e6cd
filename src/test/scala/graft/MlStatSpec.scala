package graft

/** Laws for the statistical-inference / feature-engineering wave
  * (MlStatOps): each test stages crafted tables and runs the REAL
  * `SparkEntry.queries` functions on them.
  */
class MlStatSpec extends SparkSpec {
  import spark.implicits._

  private val ns = (ms: Long) => ms * 1000000L

  private def ev(rows: Seq[(Long, Long, Long, String, Double, String)]) =
    rows.map { case (id, ms, u, t, v, p) => (id, ns(ms), u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  // ------------------------------------------------------- welch t-test

  test("welch t-test: known two-sample case matches the closed form") {
    // arm A (even user) = {1,2,3}, arm B (odd user) = {2,4,6}:
    // t = (2-4)/sqrt(1/3 + 4/3) = -1.549193…, df = (5/3)²/(17/18) ≈ 2.94
    val rows = Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, 1000L + i, 0L, "t", v, "{}") } ++
      Seq(2.0, 4.0, 6.0).zipWithIndex.map { case (v, i) =>
        (10L + i, 2000L + i, 1L, "t", v, "{}") }
    val r = run("stat_welch_ttest", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 3L && r.getLong(2) === 3L)
    assert(r.getDouble(3) === 2.0 && r.getDouble(4) === 4.0)
    assert(math.abs(r.getDouble(5) - -1.549193) < 1e-5)
    assert(math.abs(r.getDouble(6) - 2.941176) < 1e-5)
  }

  test("one-way ANOVA: known two-group case matches the closed form") {
    // group a = {1,2,3}, group b = {2,3,4}: SSB = 1.5, SSW = 4.0,
    // F = (1.5/1)/(4.0/4) = 1.5 (value² units)
    val rows = Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, 1000L + i, 0L, "a", v, "{}") } ++
      Seq(2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
        (10L + i, 2000L + i, 1L, "b", v, "{}") }
    val r = run("stat_anova_oneway", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 6L)
    assert(r.getDouble(2) === 1.5 && r.getDouble(3) === 4.0)
    assert(r.getDouble(4) === 1.5)
  }

  test("one-way ANOVA: zero within-group variance yields NULL F, not a division error") {
    val rows = Seq(
      (1L, 1000L, 0L, "a", 1.0, "{}"), (2L, 1001L, 0L, "a", 1.0, "{}"),
      (3L, 2000L, 1L, "b", 2.0, "{}"), (4L, 2001L, 1L, "b", 2.0, "{}"),
      (5L, 2002L, 1L, "b", 2.0, "{}"))
    val r = run("stat_anova_oneway", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getDouble(2) > 0) // between-group SS is real
    assert(r.getDouble(3) === 0.0 && r.isNullAt(4))
  }

  test("multiclass confusion: closed-form grid, rates, and macro-F1") {
    // y = user_id % 3, pred = value tercile (<$25 → 0, <$50 → 1, else 2)
    val rows = Seq(
      (1L, 1000L, 0L, "t", 10.0, "{}"),  // y0 p0 tp
      (2L, 2000L, 3L, "t", 30.0, "{}"),  // y0 p1 miss
      (3L, 3000L, 1L, "t", 10.0, "{}"),  // y1 p0 miss
      (4L, 4000L, 2L, "t", 60.0, "{}"))  // y2 p2 tp
    val got = run("eval_confusion_multiclass", stageTables("events" -> ev(rows)))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(got(0L) === ((2L, 2L, 1L, 0.5, 0.5, 0.5, 0.5)))
    assert(got(1L) === ((1L, 1L, 0L, 0.0, 0.0, 0.0, 0.5)))
    assert(got(2L) === ((1L, 1L, 1L, 1.0, 1.0, 1.0, 0.5)))
  }

  test("multiclass confusion: zero-support classes keep their row with NULL rates") {
    val rows = Seq(
      (1L, 1000L, 0L, "t", 10.0, "{}"),
      (2L, 2000L, 3L, "t", 10.0, "{}")) // only class 0, only pred 0
    val got = run("eval_confusion_multiclass", stageTables("events" -> ev(rows)))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(0L, 1L, 2L)) // fixed 3-row spine
    assert(got(0L).getDouble(6) === 1.0) // perfect class-0 F1
    assert(got(1L).isNullAt(4) && got(1L).isNullAt(5) && got(1L).isNullAt(6))
    assert(math.abs(got(2L).getDouble(7) - 0.333333) < 1e-6) // macro = 1.0/3
  }

  test("Levene W: known two-group case matches the closed form") {
    // a = {1,2,3}, b = {2,4,6} dollars: mean deviations (cents)
    // z_a = {100,0,100}, z_b = {200,0,200} → ANOVA on z:
    // SSB = 20000/3, SSW = 100000/3, W = (SSB/1)/(SSW/4) = 0.8
    val rows = Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, 1000L + i, 0L, "a", v, "{}") } ++
      Seq(2.0, 4.0, 6.0).zipWithIndex.map { case (v, i) =>
        (10L + i, 2000L + i, 1L, "b", v, "{}") }
    val r = run("stat_levene", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 6L)
    assert(r.getDouble(2) === 0.8)
    assert(r.getLong(3) === 1L && r.getLong(4) === 4L)
  }

  test("Levene W: zero within-group deviation yields NULL, not a division error") {
    val rows = Seq(
      (1L, 1000L, 0L, "a", 1.0, "{}"), (2L, 1001L, 0L, "a", 1.0, "{}"),
      (3L, 2000L, 1L, "b", 2.0, "{}"), (4L, 2001L, 1L, "b", 2.0, "{}"),
      (5L, 2002L, 1L, "b", 2.0, "{}"))
    val r = run("stat_levene", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 5L)
    assert(r.isNullAt(2)) // all |v − mean| are 0 → SSW = 0 → NULL W
  }

  test("Cohen's kappa: closed-form grid subtracts chance agreement") {
    // grid: y0p0 tp, y1p0 miss, y2p2 tp, y0p1 miss → po = 2/4,
    // marginals nt = (2,1,1), np = (2,1,1) → pe = 6/16, κ = 0.125/0.625
    val rows = Seq(
      (1L, 1000L, 0L, "t", 10.0, "{}"),
      (2L, 2000L, 1L, "t", 10.0, "{}"),
      (3L, 3000L, 2L, "t", 60.0, "{}"),
      (4L, 4000L, 3L, "t", 30.0, "{}"))
    val r = run("eval_cohen_kappa", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(0) === 4L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.5 && r.getDouble(3) === 0.375)
    assert(r.getDouble(4) === 0.2)
  }

  test("zipf fit: an exact 1/r frequency law fits slope -1") {
    // counts 12, 6, 4, 3 = 12/r for ranks 1..4 → slope −1, intercept ln 12
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val r = run("text_zipf_fit",
      stageTables("documents" -> Seq((1L, text)).toDF("doc_id", "text")))
      .collect()(0)
    assert(r.getLong(0) === 4L)
    assert(math.abs(r.getDouble(1) - -1.0) < 1e-4)
    assert(math.abs(r.getDouble(2) - math.log(12.0)) < 1e-4)
  }

  test("zipf fit: a single-token ledger yields NULL fits, not a division error") {
    val r = run("text_zipf_fit",
      stageTables("documents" -> Seq((1L, "a a a")).toDF("doc_id", "text")))
      .collect()(0)
    assert(r.getLong(0) === 1L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("welch t-test: two zero-variance arms yield NULL t and df, not inf") {
    val rows = Seq.tabulate(4)(i =>
      (i.toLong, 1000L + i, i.toLong % 2, "t", if (i % 2 == 0) 1.0 else 2.0, "{}"))
    val r = run("stat_welch_ttest", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  test("welch t-test: a single-row arm yields NULL (no sample variance)") {
    val rows = Seq(
      (1L, 1000L, 0L, "t", 1.0, "{}"), (2L, 1001L, 0L, "t", 5.0, "{}"),
      (3L, 1002L, 1L, "t", 3.0, "{}"))
    val r = run("stat_welch_ttest", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  // --------------------------------------------------- chi² independence

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, l, s) => (id, s"text$id", l, s, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("chi²: a proportional (independent) table scores exactly zero") {
    // counts a:(2,2) b:(3,3) — row/col products predict every cell
    val rows =
      Seq.tabulate(2)(i => (i.toLong, "a", "x")) ++
        Seq.tabulate(2)(i => (10L + i, "a", "y")) ++
        Seq.tabulate(3)(i => (20L + i, "b", "x")) ++
        Seq.tabulate(3)(i => (30L + i, "b", "y"))
    val got = run("stat_chi2_independence", stageTables("documents" -> docs(rows)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("a", 2L, 0.0), ("b", 2L, 0.0)))
  }

  test("chi²: a zero cell still contributes its expectation") {
    // lang b never appears in source y — the (b, y) cell is ABSENT from
    // the counts but must contribute e = rt·ct/N to b's statistic
    val rows =
      Seq.tabulate(2)(i => (i.toLong, "a", "x")) ++
        Seq.tabulate(2)(i => (10L + i, "a", "y")) ++
        Seq.tabulate(4)(i => (20L + i, "b", "x"))
    val got = run("stat_chi2_independence", stageTables("documents" -> docs(rows)))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // N=8, b row: e(b,x)=4·6/8=3, o=4; e(b,y)=4·2/8=1, o=0 →
    // contribution = 1/3 + 1 = 1.333333
    assert(math.abs(got("b") - 1.333333) < 1e-5)
    assert(got("a") > 0.0) // a's cells deviate symmetrically
  }

  // ----------------------------------------------------- target encoding

  test("target encode: leave-one-out excludes the row's own label") {
    // bucket 1 holds values 10 and 20 → they encode each other (20, 10);
    // bucket 2 is a singleton → NULL (never its own label)
    val rows = Seq(
      (1L, 1000L, 1L, "t", 10.0, "{\"k\": 1}"),
      (2L, 1001L, 1L, "t", 20.0, "{\"k\": 11}"), // 11 % 10 = bucket 1
      (3L, 1002L, 1L, "t", 99.0, "{\"k\": 2}"))
    val r = run("feature_target_encode", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 2L)              // singleton not encoded
    assert(r.getDouble(2) === 15.0)          // mean of {20, 10}
  }

  test("target encode: averaging LOO within the bucket's own group recovers nothing leaked") {
    // all rows share one bucket and one value — every LOO equals that
    // value exactly (no self-inclusion bias)
    val rows = Seq.tabulate(5)(i =>
      (i.toLong, 1000L + i, 1L, "t", 7.0, "{\"k\": 3}"))
    val r = run("feature_target_encode", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 5L && r.getDouble(2) === 7.0)
  }

  // ---------------------------------------------------------- basket lift

  test("basket lift: perfect co-occurrence has lift U/(ca·cb); absent pairs emit no row") {
    // u1:{A,B} u2:{A,B} u3:{A,C} — B,C never co-occur → no (B,C) row
    val rows = Seq(
      (1L, 1000L, 1L, "A", 1.0, "{}"), (2L, 1001L, 1L, "B", 1.0, "{}"),
      (3L, 1002L, 2L, "A", 1.0, "{}"), (4L, 1003L, 2L, "B", 1.0, "{}"),
      (5L, 1004L, 3L, "A", 1.0, "{}"), (6L, 1005L, 3L, "C", 1.0, "{}"))
    val got = run("assoc_basket_lift", stageTables("events" -> ev(rows))).collect()
      .map(r => (r.getString(0), r.getString(1),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    assert(got.map(t => (t._1, t._2)).toSeq === Seq(("A", "B"), ("A", "C")))
    val ab = got.find(t => t._1 == "A" && t._2 == "B").get._3
    // cab=2, U=3, cA=3, cB=2: support 2/3, conf(A→B) 2/3, lift 2·3/(3·2)=1
    assert(ab._1 === 2L)
    assert(math.abs(ab._2 - 0.666667) < 1e-5)
    assert(math.abs(ab._3 - 0.666667) < 1e-5)
    assert(ab._4 === 1.0)
  }

  // ------------------------------------------------------------- KS test

  test("KS: completely separated arms score D = 1") {
    // arm A (even user) = {1, 2}, arm B = {3, 4}: F̂a reaches 1 while
    // F̂b is still 0 → sup gap is 1
    val rows = Seq(
      (1L, 1000L, 0L, "t", 1.0, "{}"), (2L, 1001L, 0L, "t", 2.0, "{}"),
      (3L, 1002L, 1L, "t", 3.0, "{}"), (4L, 1003L, 1L, "t", 4.0, "{}"))
    val r = run("stat_ks_test", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getLong(1), r.getLong(2)) === ((2L, 2L)))
    assert(r.getDouble(3) === 1.0)
  }

  test("KS: identical arms score D = 0") {
    val rows = Seq(1.0, 2.0, 3.0).zipWithIndex.flatMap { case (v, i) => Seq(
      (i.toLong * 2, 1000L + i, 0L, "t", v, "{}"),
      (i.toLong * 2 + 1, 2000L + i, 1L, "t", v, "{}")) }
    val r = run("stat_ks_test", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getDouble(3) === 0.0)
  }

  // --------------------------------------------------------- Mann-Whitney

  test("Mann-Whitney: full separation gives AUC 0 or 1, a tie gives 0.5") {
    // type lo: A below B → AUC 0; type hi: A above B → AUC 1;
    // type eq: single tied value → AUC 0.5 (tie split)
    val rows = Seq(
      (1L, 1000L, 0L, "lo", 1.0, "{}"), (2L, 1001L, 0L, "lo", 2.0, "{}"),
      (3L, 1002L, 1L, "lo", 3.0, "{}"), (4L, 1003L, 1L, "lo", 4.0, "{}"),
      (5L, 1004L, 0L, "hi", 3.0, "{}"), (6L, 1005L, 0L, "hi", 4.0, "{}"),
      (7L, 1006L, 1L, "hi", 1.0, "{}"), (8L, 1007L, 1L, "hi", 2.0, "{}"),
      (9L, 1008L, 0L, "eq", 5.0, "{}"), (10L, 1009L, 1L, "eq", 5.0, "{}"))
    val got = run("stat_mann_whitney", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got("lo") === ((0L, 0.0)))
    assert(got("hi") === ((8L, 1.0)))   // u2 = 2U = 2·na·nb
    assert(got("eq") === ((1L, 0.5)))
  }

  // ------------------------------------------------------ vocab coverage

  test("vocab coverage: tokens past the top-100 cut count as OOV") {
    // doc 1 (en): 120 distinct tokens t001..t120, each once;
    // doc 2 (fr): t001 five times. Counts: t001=6, others 1 → the
    // tie-broken vocab is exactly {t001..t100} and doc 1 covers 100/120
    val toks = (1 to 120).map(i => f"t$i%03d")
    val docs = Seq(
      (1L, toks.mkString(" "), "en", "s0", 100L),
      (2L, Seq.fill(5)("t001").mkString(" "), "fr", "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = run("tokenizer_vocab_coverage", stageTables("documents" -> docs))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("fr") === 1.0)
    assert(got("en") === 0.833333)      // (100·1e6 div 120) / 1e6
  }

  // ---------------------------------------------------------- bootstrap

  test("bootstrap CI collapses to the point for a constant stream") {
    // every replicate's weighted mean of a constant IS the constant —
    // lo = mean = hi regardless of the weights drawn
    val rows = Seq.tabulate(40)(i => (i.toLong, 1000L + i, 1L, "t", 5.0, "{}"))
    val r = run("stat_bootstrap_ci", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 40L)
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) === ((5.0, 5.0, 5.0)))
  }

  test("bootstrap CI brackets are ordered on a spread stream") {
    val rows = Seq.tabulate(60)(i =>
      (i.toLong, 1000L + i, 1L, "t", 1.0 + (i % 10), "{}"))
    val r = run("stat_bootstrap_ci", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getDouble(3) <= r.getDouble(2) + 1.0)  // lo near mean
    assert(r.getDouble(3) < r.getDouble(4))          // lo strictly under hi
    assert(r.getDouble(2) >= r.getDouble(3) - 1.0 &&
      r.getDouble(2) <= r.getDouble(4) + 1.0)
  }

  // ------------------------------------------------------------- bigram LM

  test("bigram logprob applies add-one smoothing over corpus counts") {
    // one doc "a b a b": bigrams ab,ba,ab; c(ab)=2, c(ba)=1, c(a)=c(b)=2,
    // V=2 → avg = (2·ln(3/4) + ln(2/4)) / 3 = −0.4228 at 4dp
    val docs = Seq((1L, "a b a b", "en", "s0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = run("text_bigram_logprob", stageTables("documents" -> docs)).collect()(0)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === -0.4228)
  }

  test("a one-token document has no bigrams and drops out") {
    val docs = Seq(
      (1L, "solo", "en", "s0", 4L),
      (2L, "a b", "en", "s0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = run("text_bigram_logprob", stageTables("documents" -> docs)).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(2L))
  }

  // -------------------------------------------------- permutation test

  test("permutation test: identical arms give p = 1") {
    // every value appears once per arm → observed Δ = 0, and every
    // permuted Δ ≥ 0 trivially → n_ge = 16, p = 17/17
    val rows = (0 until 20).map(i =>
      (i.toLong, 1000L + i, i.toLong % 2, "t", 5.0 + (i / 2) % 5, "{}"))
    val r = run("stat_permutation_test", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(4) === 16L)
    assert(r.getDouble(5) === 1.0)
  }

  test("permutation test: a huge real effect survives every resample") {
    // arm A all $1, arm B all $100 — no md5 relabeling of 80 rows
    // reproduces a $99 gap → n_ge = 0, p = 1/17
    val rows = (0 until 80).map(i =>
      (i.toLong, 1000L + i, i.toLong % 2, "t",
        if (i % 2 == 0) 1.0 else 100.0, "{}"))
    val r = run("stat_permutation_test", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getDouble(3) === 99.0)
    assert(r.getLong(4) === 0L)
    assert(r.getDouble(5) === 0.058824)
  }

  // ----------------------------------------------------- CSV dead letter

  test("CSV dead-letter path quarantines the corrupted 1-in-7 rows") {
    // ids 1..7, all one type: id 7 stages as 'xx' in the cents field →
    // 6 parsed, 1 dead letter, checksum over survivors only
    val rows = (1 to 7).map(i =>
      (i.toLong, 1000L + i, 1L, "t", i.toDouble, "{}"))
    val r = run("scan_csv_badrecords", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((7L, 6L, 1L)))
    assert(r.getLong(4) === (1 to 6).map(_ * 100L).sum)
  }

  // ------------------------------------------------------- containment

  test("containment flags a quoted (subset) document that Jaccard understates") {
    // doc 2 is doc 1 plus a one-token wrapper: every gram of doc 1
    // appears in doc 2 → C(1→2) = 1.0 exactly; the reverse direction
    // is 8/9. (The pair band-collides — J = 8/9 is far above the LSH
    // threshold — so the shared candidate path proposes it.)
    val base = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base, "en", "s0", 50L),
      (2L, base + " w11", "en", "s0", 55L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = run("dedup_ngram_containment", stageTables("documents" -> docs))
      .collect()
    assert(got.length === 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 0.888889)
  }

  // ------------------------------------------------------ classifier eval

  test("classifier eval: a perfect rule scores 1.0 across the board") {
    val rows = Seq(
      (1L, 1000L, 1L, "purchase", 60.0, "{}"), (2L, 1001L, 1L, "purchase", 70.0, "{}"),
      (3L, 1002L, 1L, "view", 40.0, "{}"), (4L, 1003L, 1L, "view", 30.0, "{}"))
    val r = run("eval_binary_classifier", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) === ((2L, 0L, 0L, 2L)))
    assert((r.getDouble(6), r.getDouble(7), r.getDouble(8), r.getDouble(9))
      === ((1.0, 1.0, 1.0, 1.0)))
  }

  test("classifier eval: a coin-flip rule scores 0.5 everywhere it can") {
    // tp=1 fp=1 fn=1 tn=1; AUC pairs split 2-2
    val rows = Seq(
      (1L, 1000L, 1L, "purchase", 60.0, "{}"), (2L, 1001L, 1L, "purchase", 40.0, "{}"),
      (3L, 1002L, 1L, "view", 70.0, "{}"), (4L, 1003L, 1L, "view", 30.0, "{}"))
    val r = run("eval_binary_classifier", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) === ((1L, 1L, 1L, 1L)))
    assert((r.getDouble(6), r.getDouble(7), r.getDouble(8), r.getDouble(9))
      === ((0.5, 0.5, 0.5, 0.5)))
  }

  // ------------------------------------------------------------- ANN NDCG

  test("NDCG over the fixture probes is a valid graded score") {
    val got = run("sim_ann_ndcg").collect()
    assert(got.length === 3)
    got.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 10L)
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("MRR over the fixture probes is a valid self-excluded head score") {
    val got = run("sim_ann_mrr").collect()
    // ivf, lsh, pq, and (since round 10) sq8
    assert(got.length === 4)
    got.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 3L)
      // self is excluded from relevance, so when each method ranks the
      // probe itself first the reciprocal rank is at most 1/2 — and a
      // hit exists for every probe on this corpus
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  // -------------------------------------------------------- balance/winsor

  test("class balancing cuts every class to the minority size") {
    val rows = (0 until 5).map(i => (i.toLong, 1000L + i, 1L, "A", 1.0, "{}")) ++
      Seq((10L, 2000L, 1L, "B", 1.0, "{}"), (11L, 2001L, 1L, "B", 1.0, "{}"))
    val got = run("sample_class_balance", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("A" -> 2L, "B" -> 2L))
  }

  test("winsorized mean saturates the outlier at the 95th percentile") {
    // values $1..$19 plus a $1000 spike (n=20): p5=$1, p95=$19, the
    // spike clips to 19 → mean (190+19)/20 = 10.45
    val rows = ((1 to 19).map(i => (i.toLong, 1000L + i, 1L, "t", i.toDouble, "{}")) :+
      (20L, 1020L, 1L, "t", 1000.0, "{}"))
    val r = run("agg_winsorized_mean", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getDouble(2), r.getDouble(3)) === ((1.0, 19.0)))
    assert(r.getDouble(4) === 10.45)
  }

  test("calibration bins report observed positive rate against mean score") {
    // low bin: two views (rate 0); top bin: two purchases (rate 1)
    val rows = Seq(
      (1L, 1000L, 1L, "view", 5.0, "{}"), (2L, 1001L, 1L, "view", 6.0, "{}"),
      (3L, 1002L, 1L, "purchase", 95.0, "{}"),
      (4L, 1003L, 1L, "purchase", 99.0, "{}"))
    val got = run("eval_calibration", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got(0L) === ((2L, 0.0)))
    assert(got(9L) === ((2L, 1.0)))
  }

  test("char entropy separates repeated padding from diverse text") {
    // "aaaaaaaa" → 0 bits (band 0); "abcdefgh" → 3 bits (band 6)
    val docs = Seq(
      (1L, "aaaaaaaa", "en", "s0", 8L),
      (2L, "abcdefgh", "en", "s0", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = run("text_char_entropy", stageTables("documents" -> docs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 6L -> 1L))
  }

  // ---------------------------------------------------------- FDR / PR

  test("BH rejects the decisive types and spares the null one") {
    // three types with a massive effect (p = 1/17 each) and one null
    // (p = 1): the step-up passes at k = 3 (1/17 ≤ 3·0.1/4) — all
    // three effects reject, the null does not. With only TWO effects
    // among four hypotheses nothing would reject (1/17 > 2·0.025):
    // the cut is a joint property of the whole p-value set, which is
    // exactly what BH is for.
    val rows = (0 until 80).flatMap { i =>
      val arm = i % 2
      Seq("big1", "big2", "big3").zipWithIndex.map { case (t, j) =>
        (1000L * (j + 1) + i, 1000L + i, arm.toLong, t,
          if (arm == 0) 1.0 else 100.0, "{}") } :+
        (9000L + i, 9000L + i, arm.toLong, "null1", 5.0, "{}")
    }
    val got = run("stat_fdr_bh", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("big1") === 1L && got("big2") === 1L && got("big3") === 1L)
    assert(got("null1") === 0L)
  }

  test("PR sweep: raising the threshold trades recall for precision") {
    // purchases at high values, views at low → precision 1.0 once the
    // threshold clears the views; recall falls as it clears purchases
    val rows = Seq(
      (1L, 1000L, 1L, "view", 15.0, "{}"), (2L, 1001L, 1L, "view", 25.0, "{}"),
      (3L, 1002L, 1L, "purchase", 55.0, "{}"),
      (4L, 1003L, 1L, "purchase", 85.0, "{}"))
    val got = run("eval_pr_sweep", stageTables("events" -> ev(rows))).collect()
      .filter(r => !r.isNullAt(3))
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1000L) === ((0.5, 1.0)))   // $10: everything predicted
    assert(got(3000L) === ((1.0, 1.0)))   // $30: views cleared
    assert(got(6000L) === ((1.0, 0.5)))   // $60: one purchase lost
  }

  // ---------------------------------------------------- stats / decay

  test("column profile reports nulls, distincts, and bounds per column") {
    val li = Seq(
      (1.0, 10.0, 0.1), (2.0, 20.0, 0.1), (2.0, 30.0, 0.2))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
    val got = run("profile_column_stats", stageTables("lineitem" -> li)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got("l_quantity") === ((3L, 0L, 2L, 1.0, 2.0)))
    assert(got("l_extendedprice") === ((3L, 0L, 3L, 10.0, 30.0)))
    assert(got("l_discount") === ((3L, 0L, 2L, 0.1, 0.2)))
  }

  test("decay score halves per day and sums at the head") {
    // u1: events at head and exactly 1 day earlier → 1.0 + 0.5
    val D = 86400000L
    val rows = Seq(
      (1L, 1000L, 1L, "view", 1.0, "{}"),
      (2L, 1000L + D, 1L, "view", 1.0, "{}"))
    val r = run("feature_decay_score", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.5)
  }

  // -------------------------------------------------------- audit/benford

  test("FK audit classifies matched, childless, and orphaned keys") {
    val orders = Seq((1L, 1L, "F", 10.0, "1-URGENT"), (2L, 1L, "F", 10.0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val li = Seq((1L, 101L), (1L, 102L), (9L, 103L))  // order 9 has no parent
      .toDF("l_orderkey", "l_partkey")
    val r = run("audit_fk_integrity",
      stageTables("orders" -> orders, "lineitem" -> li)).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 1L, 1L)))
  }

  test("Benford digits: exact shares against the log10 law") {
    // 9 orders with totals 1..9 dollars — one per leading digit, each
    // observed share exactly 1/9
    val orders = (1 to 9).map(i => (i.toLong, 1L, "F", i.toDouble, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val got = run("agg_benford_digits", stageTables("orders" -> orders)).collect()
    assert(got.length === 9)
    assert(got.forall(_.getDouble(2) === 0.111111))
    // digit 1's Benford share is log10(2) = 0.301030
    assert(got(0).getDouble(3) === 0.30103)
  }

  // --------------------------------------------------- tukey / trimmed

  test("Tukey fences flag only the planted spike") {
    // 19 values $10..$28 plus a $500 spike: Q1=$14, Q3=$24, IQR=$10 →
    // fences [-$1, $39] — exactly the spike sits above
    val rows = ((0 until 19).map(i =>
      (i.toLong, 1000L + i, 1L, "t", 10.0 + i, "{}")) :+
      (20L, 1020L, 1L, "t", 500.0, "{}"))
    val r = run("anomaly_tukey_fence", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getLong(2), r.getLong(3)) === ((-100L, 3900L)))
    assert((r.getLong(4), r.getLong(5)) === ((0L, 1L)))
  }

  test("trimmed mean excludes the tails the winsorized mean clips") {
    // 20 values: $1..$19 + a $1000 spike; cut = 1 each side → keep
    // ranks 2..19 = values $2..$19 → mean 10.5 (winsorized gave 10.45)
    val rows = ((1 to 19).map(i =>
      (i.toLong, 1000L + i, 1L, "t", i.toDouble, "{}")) :+
      (20L, 1020L, 1L, "t", 1000.0, "{}"))
    val r = run("agg_trimmed_mean", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 18L)
    assert(r.getDouble(2) === 10.5)
  }

  test("Cohen's d: known two-sample case matches the closed form") {
    // arm A (even user) = {1,2,3} (mean 2, var 1), arm B (odd user) =
    // {2,4,6} (mean 4, var 4): s²_pooled = (2·1 + 2·4)/4 = 2.5,
    // d = (2−4)/√2.5 = −1.264911…
    val rows = Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, 1000L + i, 0L, "t", v, "{}") } ++
      Seq(2.0, 4.0, 6.0).zipWithIndex.map { case (v, i) =>
        (10L + i, 2000L + i, 1L, "t", v, "{}") }
    val r = run("stat_cohens_d", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(1) === 3L && r.getLong(2) === 3L)
    assert(math.abs(r.getDouble(3) - 1.581139) < 1e-6)
    assert(math.abs(r.getDouble(4) - -1.264911) < 1e-6)
  }

  test("Cohen's d: a zero-variance pair of arms yields NULL d, not ±inf") {
    val rows = Seq(
      (1L, 1000L, 0L, "t", 1.0, "{}"), (2L, 1001L, 2L, "t", 1.0, "{}"),
      (3L, 2000L, 1L, "t", 2.0, "{}"), (4L, 2001L, 3L, "t", 2.0, "{}"))
    val r = run("stat_cohens_d", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getDouble(3) === 0.0 && r.isNullAt(4))
  }

  test("MCC: closed-form 2×2 and the zero-marginal NULL guard") {
    // tp=2 (purchase ≥ $50), fp=1, fn=1, tn=2 →
    // MCC = (2·2 − 1·1)/√(3·3·3·3) = 3/9 = 0.333333
    val rows = Seq(
      (1L, 1000L, 1L, "purchase", 60.0, "{}"),
      (2L, 1001L, 2L, "purchase", 70.0, "{}"),
      (3L, 1002L, 3L, "purchase", 10.0, "{}"),
      (4L, 1003L, 4L, "view", 80.0, "{}"),
      (5L, 1004L, 5L, "view", 20.0, "{}"),
      (6L, 1005L, 6L, "view", 30.0, "{}"))
    val r = run("eval_mcc", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 1L, 2L)))
    assert(math.abs(r.getDouble(4) - 0.333333) < 1e-6)
    // all-negative predictions: tp+fp = 0 → NULL, never 0/0
    val r2 = run("eval_mcc", stageTables("events" -> ev(Seq(
      (1L, 1000L, 1L, "purchase", 10.0, "{}"),
      (2L, 1001L, 2L, "view", 20.0, "{}"))))).collect()(0)
    assert(r2.isNullAt(4))
  }

  test("Brier score: closed-form residuals in exact basis-10⁴ integers") {
    // purchase @ $80 → p 0.8, r² 0.04; view @ $10 → p 0.1, r² 0.01
    // → brier = 0.025 exactly
    val rows = Seq(
      (1L, 1000L, 1L, "purchase", 80.0, "{}"),
      (2L, 1001L, 2L, "view", 10.0, "{}"))
    val r = run("eval_brier_score", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((2L, 1L)))
    assert(r.getDouble(2) === 0.025)
  }

  test("log loss: symmetric confident-correct pair, and the eps clamp") {
    // purchase @ $99 (p .99) and view @ $1 (p .01): both terms are
    // −ln(0.99) → mean 0.01005 after per-row 10⁶ quantization
    val rows = Seq(
      (1L, 1000L, 1L, "purchase", 99.0, "{}"),
      (2L, 1001L, 2L, "view", 1.0, "{}"))
    val r = run("eval_log_loss", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((2L, 1L)))
    assert(math.abs(r.getDouble(2) - 0.01005) < 1e-6)
    // a sub-cent score clamps to p = 0.01, not ln(0): −ln(0.01) = 4.60517
    val r2 = run("eval_log_loss", stageTables("events" -> ev(Seq(
      (1L, 1000L, 1L, "purchase", 0.01, "{}"))))).collect()(0)
    assert(math.abs(r2.getDouble(2) - 4.60517) < 1e-6)
  }

  test("AUC: perfect separation scores 1, an all-tie score 0.5, one class NULL") {
    val sep = Seq(
      (1L, 1000L, 1L, "purchase", 80.0, "{}"),
      (2L, 1001L, 2L, "purchase", 90.0, "{}"),
      (3L, 1002L, 3L, "view", 10.0, "{}"),
      (4L, 1003L, 4L, "view", 20.0, "{}"))
    val r = run("eval_auc", stageTables("events" -> ev(sep))).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert(r.getDouble(2) === 1.0)
    val tie = Seq(
      (1L, 1000L, 1L, "purchase", 50.0, "{}"),
      (2L, 1001L, 2L, "view", 50.0, "{}"))
    val r2 = run("eval_auc", stageTables("events" -> ev(tie))).collect()(0)
    assert(r2.getDouble(2) === 0.5)
    val mono = Seq((1L, 1000L, 1L, "purchase", 50.0, "{}"))
    val r3 = run("eval_auc", stageTables("events" -> ev(mono))).collect()(0)
    assert(r3.isNullAt(2))
  }

  test("Spearman: monotone days score +1, anti-monotone −1") {
    val D = 86400000L
    // type "up": busier days carry more value (cnt 1,2,3 / vsum
    // 100,200,300); type "dn": busier days carry LESS (vsum 300,200,100)
    def day(t: String, d: Long, n: Int, v: Double, base: Long) =
      (0 until n).map(i => (base + d * 10 + i, d * D + i * 1000L,
        base + i, t, v, "{}"))
    val rows =
      day("up", 0, 1, 1.0, 100L) ++ day("up", 1, 2, 1.0, 200L) ++
        day("up", 2, 3, 1.0, 300L) ++
        day("dn", 0, 1, 3.0, 400L) ++ day("dn", 1, 2, 1.0, 500L) ++
        day("dn", 2, 3, 1.0 / 3, 600L)
    val r = run("stat_spearman_rho", stageTables("events" -> ev(rows)))
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("up") === 1.0)
    assert(r("dn") === -1.0)
  }

  test("two-proportion power: textbook 10% vs 15% needs ~686 per arm") {
    // arm A converts 10/100, arm B 15/100 (conversion = value ≥ $50):
    // n = (1.959964·√(2·.125·.875) + 0.841621·√(.09+.1275))²/.05²
    //   ≈ 685.6 — the standard two-proportion calculator answer
    val rows = (0 until 100).flatMap { i =>
      Seq((i.toLong * 2, 1000L + i, i.toLong * 2, "t",
        if (i < 10) 60.0 else 10.0, "{}"),
        (i.toLong * 2 + 1, 2000L + i, i.toLong * 2 + 1, "t",
          if (i < 15) 60.0 else 10.0, "{}"))
    }
    val r = run("stat_power_twoprop", stageTables("events" -> ev(rows))).collect()(0)
    assert((r.getLong(1), r.getLong(2)) === ((100L, 100L)))
    assert((r.getDouble(3), r.getDouble(4)) === ((0.1, 0.15)))
    assert(math.abs(r.getDouble(5) - 685.63) < 0.5)
    // equal arms: no finite n detects a zero lift
    val same = (0 until 4).map(i =>
      (i.toLong, 1000L + i, i.toLong, "t", 60.0, "{}"))
    val r2 = run("stat_power_twoprop", stageTables("events" -> ev(same))).collect()(0)
    assert(r2.isNullAt(5))
  }

  test("lift deciles: a perfect ranking concentrates all response up top") {
    // 10 positives at the 10 highest scores over 100 rows → decile 1
    // holds every positive: rate 1.0, lift 10; deciles 2-10 lift 0
    val rows = (0 until 100).map { i =>
      (i.toLong, 1000L + i, i.toLong,
        if (i < 10) "purchase" else "view", 100.0 - i, "{}")
    }
    val out = run("eval_lift_deciles", stageTables("events" -> ev(rows)))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.size === 10)
    assert(out(1L) === ((10L, 10L, 1.0, 10.0)))
    (2L to 10L).foreach(d => assert(out(d)._2 === 0L && out(d)._4 === 0.0))
  }

  test("TOST: tight equal arms prove equivalence; a real gap fails it") {
    // "eq": both arms mean $10 with ±10¢ spread → |t| ≫ 1.645 both
    // sides → equivalent. "ne": means $10 vs $30 → t_lower < 0 → not.
    def arm(t: String, base: Double, users: Range, idBase: Long) =
      users.map(u => (idBase + u, 1000L + u, u.toLong, t,
        base + (if ((u / 2) % 2 == 0) -0.1 else 0.1), "{}"))
    val rows = arm("eq", 10.0, 0 until 100, 0L) ++
      arm("ne", 10.0, 0 until 100 by 2, 1000L) ++   // even users only
      arm("ne", 30.0, 1 until 100 by 2, 2000L)      // odd users only
    val r = run("stat_tost_equivalence", stageTables("events" -> ev(rows)))
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(3), x.getBoolean(7)))).toMap
    assert(r("eq")._1 === 0.0 && r("eq")._2 === true)
    assert(r("ne")._2 === false)
  }

  test("Youden threshold: perfect separation cuts at the lowest positive") {
    val rows = Seq(
      (1L, 1000L, 1L, "purchase", 80.0, "{}"),
      (2L, 1001L, 2L, "purchase", 90.0, "{}"),
      (3L, 1002L, 3L, "view", 10.0, "{}"),
      (4L, 1003L, 4L, "view", 20.0, "{}"))
    val r = run("eval_youden_threshold", stageTables("events" -> ev(rows)))
      .collect()(0)
    assert(r.getLong(0) === 8000L, "cut at the lowest positive score")
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) ===
      ((1.0, 0.0, 1.0)))
  }

  test("Kendall tau-b: monotone ±1, tie-corrected grid, all-x-tie NULL") {
    // A: perfectly concordant → +1; B: reversed → −1; C: x never
    // varies → A-factor 0 → NULL; D: one y-tie pair → C−D = 2 of
    // n0 = 3, tie-corrected τ-b = 2·2/√(6·4) = 0.816497
    val li = Seq(
      ("A", 1.0, 0.00), ("A", 2.0, 0.01), ("A", 3.0, 0.02),
      ("B", 1.0, 0.02), ("B", 2.0, 0.01), ("B", 3.0, 0.00),
      ("C", 5.0, 0.00), ("C", 5.0, 0.05),
      ("D", 1.0, 0.00), ("D", 2.0, 0.00), ("D", 3.0, 0.01))
      .toDF("l_returnflag", "l_quantity", "l_discount")
    val r = run("stat_kendall_tau", stageTables("lineitem" -> li))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    assert(r("A") === Some(1.0) && r("B") === Some(-1.0))
    assert(r("C") === None)
    assert(r("D") === Some(0.816497))
  }

  test("proportions z-test: clean separation at n=2 per arm gives z = 2") {
    // arm A (even users) converts 2/2, arm B 0/2: pooled p̄ = ½,
    // z = 1/√(¼·(½+½)) = 2.0, just past the 1.959964 cut
    val rows = Seq(
      (1L, 0L, 2L, "t", 60.0, "{}"), (2L, 1L, 4L, "t", 70.0, "{}"),
      (3L, 2L, 1L, "t", 10.0, "{}"), (4L, 3L, 3L, "t", 20.0, "{}"))
    val r = run("stat_proportions_ztest", stageTables("events" -> ev(rows)))
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((2L, 2L, 2L, 0L)))
    assert(r.getDouble(5) === 2.0 && r.getBoolean(6) === true)
  }

  test("Wilcoxon signed-rank: three positive day-diffs match the closed form") {
    // day diffs +1000, +2000, +3000 cents: ×2 ranks {2,4,6} all
    // positive → W₂ = 12, E = 6, var·12 = 2·3·4·7 = 168 (no ties),
    // z = 6/√14 = 1.603567
    val D = 86400000L
    val rows = Seq(
      (1L, 0L, 2L, "t", 20.0, "{}"), (2L, 1L, 1L, "t", 10.0, "{}"),
      (3L, D, 2L, "t", 30.0, "{}"), (4L, D + 1, 1L, "t", 10.0, "{}"),
      (5L, 2 * D, 2L, "t", 40.0, "{}"), (6L, 2 * D + 1, 1L, "t", 10.0, "{}"))
    val r = run("stat_wilcoxon_signed_rank", stageTables("events" -> ev(rows)))
      .collect()(0)
    assert((r.getLong(1), r.getLong(2)) === ((3L, 12L)))
    assert(r.getDouble(3) === 1.603567)
  }

  test("Neyman allocation: budget follows N_h·S_h; certain strata get zero") {
    // stratum a = {1,1} (sd 0 → weight 0), stratum b = {1,3} (sd √2),
    // singleton c (sd NULL → weight 0): the whole 1000-sample budget
    // lands on b
    val rows = Seq(
      (1L, 1000L, 1L, "a", 1.0, "{}"), (2L, 1001L, 2L, "a", 1.0, "{}"),
      (3L, 2000L, 3L, "b", 1.0, "{}"), (4L, 2001L, 4L, "b", 3.0, "{}"),
      (5L, 3000L, 5L, "c", 9.0, "{}"))
    val out = run("sample_neyman_alloc", stageTables("events" -> ev(rows)))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        r.getLong(3))).toSeq
    assert(out === Seq(
      ("a", 2L, 0.0, 0L),
      ("b", 2L, 1.414214, 1000L),
      ("c", 1L, null, 0L)))
  }

  test("basket lift: duplicate events do not inflate the basket") {
    // u1 fires A five times — the basket still holds one A
    val rows = Seq.tabulate(5)(i =>
      (i.toLong, 1000L + i, 1L, "A", 1.0, "{}")) ++ Seq(
      (10L, 2000L, 1L, "B", 1.0, "{}"),
      (11L, 2001L, 2L, "A", 1.0, "{}"), (12L, 2002L, 2L, "B", 1.0, "{}"))
    val r = run("assoc_basket_lift", stageTables("events" -> ev(rows))).collect()(0)
    assert(r.getLong(2) === 2L)   // both users co-hold {A,B} exactly once
    assert(r.getDouble(5) === 1.0)
  }
}

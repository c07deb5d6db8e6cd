package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, OSql, Q, Tables}

/** ML feature-engineering and model-fitting primitives over the
  * relational archive — the preprocessing a training pipeline runs
  * after curation: closed-form regression from exact sufficient
  * statistics, per-key min-max feature scaling, the hashing-trick
  * vectorizer, and sequential path mining. All hash-verified against
  * DuckDB.
  *
  * Scale shape (the 100 TB stance, per operator):
  *  - agg_ols2: the fact table collapses MAP-SIDE to |flags| rows of
  *    nine exact DECIMAL moment sums; the 2×2 normal-equation solve is
  *    a projection over that tiny aggregate (the closed form needs no
  *    iteration and no matrix library).
  *  - feature_minmax_scale: per-type extrema collapse map-side and
  *    broadcast back over the fact scan — the fact table is read once
  *    and NEVER shuffled (the anomaly_zscore layout).
  *  - text_hashing_trick: explode → partial+final agg keyed by a
  *    256-ary md5-prefix bucket — the shuffle carries (bucket, token)
  *    pairs, bounded by vocabulary, never document text.
  *  - seq_trigram_paths: two lag taps share one (user_id; ms,
  *    event_id) window spec (ONE exchange + sort), path counts
  *    collapse map-side, and the global top-10 is a TakeOrdered —
  *    O(k·partitions) driver cost, no global sort.
  */
object FeatureOps {
  import Det._

  // ------------------------------------------------------------------
  // agg_ols2 — two-feature ordinary least squares per returnflag:
  // price ~ β0 + β1·quantity + β2·discount, solved in CLOSED FORM
  // from nine exact decimal moment sums (quantity integral, price and
  // discount 2-decimal → every cross-product is an exact ≤4-decimal
  // value, so the DECIMAL(38,6) sums are exact and order-independent).
  // The centered normal equations reduce to a 2×2 Cramer solve —
  // identical double-formula text in both engines, rounded once.
  // The single-feature sibling is agg_corr's OLS slope.
  // ------------------------------------------------------------------

  private val aggOls2 = Q(
    "agg_ols2",
    (s, d) => {
      import s.implicits._
      val li = Tables.t(s, d, "lineitem").select($"l_returnflag",
        $"l_quantity".as("x1"), $"l_discount".as("x2"),
        $"l_extendedprice".as("y"))
      val m = li.groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        sum($"x1".cast(Dec)).cast("double").as("sx1"),
        sum($"x2".cast(Dec)).cast("double").as("sx2"),
        sum($"y".cast(Dec)).cast("double").as("sy"),
        sum(($"x1" * $"x1").cast(Dec)).cast("double").as("sx1x1"),
        sum(($"x2" * $"x2").cast(Dec)).cast("double").as("sx2x2"),
        sum(($"x1" * $"x2").cast(Dec)).cast("double").as("sx1x2"),
        sum(($"x1" * $"y").cast(Dec)).cast("double").as("sx1y"),
        sum(($"x2" * $"y").cast(Dec)).cast("double").as("sx2y"))
      m.withColumn("a11", $"n" * $"sx1x1" - $"sx1" * $"sx1")
        .withColumn("a12", $"n" * $"sx1x2" - $"sx1" * $"sx2")
        .withColumn("a22", $"n" * $"sx2x2" - $"sx2" * $"sx2")
        .withColumn("b1", $"n" * $"sx1y" - $"sx1" * $"sy")
        .withColumn("b2", $"n" * $"sx2y" - $"sx2" * $"sy")
        .withColumn("det", $"a11" * $"a22" - $"a12" * $"a12")
        // a collinear design has no unique solution — emit NULLs, not
        // the engine-dependent x/0 a naked Cramer division would give
        .withColumn("beta1",
          when($"det" =!= 0, ($"a22" * $"b1" - $"a12" * $"b2") / $"det"))
        .withColumn("beta2",
          when($"det" =!= 0, ($"a11" * $"b2" - $"a12" * $"b1") / $"det"))
        .select($"l_returnflag", $"n".cast("long").as("n"),
          dround($"beta1", 6).as("beta_quantity"),
          dround($"beta2", 6).as("beta_discount"),
          dround(($"sy" - $"beta1" * $"sx1" - $"beta2" * $"sx2") / $"n", 6)
            .as("beta_intercept"))
        .orderBy("l_returnflag")
    },
    Some("WITH m AS (SELECT l_returnflag, " +
      "CAST(count(*) AS DOUBLE) AS n, " +
      "CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sx1, " +
      "CAST(sum(CAST(l_discount AS DECIMAL(20,6))) AS DOUBLE) AS sx2, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sy, " +
      "CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sx1x1, " +
      "CAST(sum(CAST(l_discount * l_discount AS DECIMAL(20,6))) AS DOUBLE) AS sx2x2, " +
      "CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(20,6))) AS DOUBLE) AS sx1x2, " +
      "CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sx1y, " +
      "CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sx2y " +
      "FROM lineitem GROUP BY 1), " +
      "c AS (SELECT l_returnflag, n, sx1, sx2, sy, " +
      "n*sx1x1 - sx1*sx1 AS a11, n*sx1x2 - sx1*sx2 AS a12, " +
      "n*sx2x2 - sx2*sx2 AS a22, n*sx1y - sx1*sy AS b1, " +
      "n*sx2y - sx2*sy AS b2 FROM m), " +
      "sv AS (SELECT l_returnflag, n, sx1, sx2, sy, " +
      "CASE WHEN a11*a22 - a12*a12 <> 0 THEN " +
      "(a22*b1 - a12*b2) / (a11*a22 - a12*a12) END AS beta1, " +
      "CASE WHEN a11*a22 - a12*a12 <> 0 THEN " +
      "(a11*b2 - a12*b1) / (a11*a22 - a12*a12) END AS beta2 FROM c) " +
      "SELECT l_returnflag, CAST(n AS BIGINT) AS n, " +
      OSql.sround("beta1", 6) + " AS beta_quantity, " +
      OSql.sround("beta2", 6) + " AS beta_discount, " +
      OSql.sround("(sy - beta1*sx1 - beta2*sx2) / n", 6) +
      " AS beta_intercept FROM sv ORDER BY 1"))

  // ------------------------------------------------------------------
  // feature_minmax_scale — per-type min-max normalization of the value
  // signal to [0, 1] (the feature-scaling pass before training): the
  // per-type extrema collapse map-side to |types| rows and broadcast
  // back over the fact scan — the fact table itself never shuffles.
  // Exact cent integers in, ONE division out.
  // ------------------------------------------------------------------

  private val featureMinmaxScale = Q(
    "feature_minmax_scale",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"event_type", $"event_id",
          round($"value" * 100).cast("long").as("v"))
      val ext = ev.groupBy("event_type")
        .agg(min($"v").as("vmin"), max($"v").as("vmax"))
      ev.join(broadcast(ext), Seq("event_type"))
        .filter($"vmax" > $"vmin")
        .select($"event_type", $"event_id",
          dround(($"v" - $"vmin").cast("double")
            / ($"vmax" - $"vmin").cast("double"), 6).as("scaled"))
        .orderBy("event_type", "event_id")
    },
    Some("WITH b AS (SELECT event_type, event_id, " +
      "CAST(round(value*100) AS BIGINT) AS v FROM events), " +
      "e AS (SELECT event_type, min(v) AS vmin, max(v) AS vmax " +
      "FROM b GROUP BY 1) " +
      "SELECT event_type, event_id, " +
      OSql.sround("CAST(v - vmin AS DOUBLE) / CAST(vmax - vmin AS DOUBLE)", 6) +
      " AS scaled FROM b JOIN e USING (event_type) " +
      "WHERE vmax > vmin ORDER BY event_type, event_id"))

  // ------------------------------------------------------------------
  // text_hashing_trick — the feature-hashing vectorizer (the fixed-
  // dimension text featurizer that needs no vocabulary pass): every
  // token maps to one of 256 buckets by md5-hex prefix — engine-
  // portable, no integer conversion needed — and the report carries
  // per-bucket token mass plus distinct-token load (the collision
  // measure that sizes the hash dimension). Shuffle carries (bucket,
  // token), bounded by vocabulary.
  // ------------------------------------------------------------------

  private val textHashingTrick = Q(
    "text_hashing_trick",
    (s, d) => {
      import s.implicits._
      Tables.t(s, d, "documents")
        .select(explode(split($"text", " ")).as("tok"))
        .filter(length($"tok") > 0)
        .select(substring(md5($"tok"), 1, 2).as("bucket"), $"tok")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct($"tok").as("n_distinct"))
        .orderBy("bucket")
    },
    Some("WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok " +
      "FROM documents), " +
      "b AS (SELECT substring(md5(tok), 1, 2) AS bucket, tok FROM t " +
      "WHERE length(tok) > 0) " +
      "SELECT bucket, count(*) AS n_tokens, " +
      "count(DISTINCT tok) AS n_distinct FROM b GROUP BY 1 ORDER BY 1"))

  // ------------------------------------------------------------------
  // seq_trigram_paths — the top-10 3-event behavioral paths (the
  // next-order sibling of markov_transitions' bigrams): two lag taps
  // over ONE (user_id; ms, event_id) window spec give each event its
  // two predecessors, complete trigrams count map-side, and the
  // global top-10 is a TakeOrdered with (count desc, path asc)
  // tiebreak — no global sort anywhere.
  // ------------------------------------------------------------------

  private val seqTrigramPaths = Q(
    "seq_trigram_paths",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ms".asc, $"event_id".asc)
      Tables.events(s, d)
        .select($"user_id", $"ms", $"event_id", $"event_type")
        .withColumn("p1", lag($"event_type", 1).over(w))
        .withColumn("p2", lag($"event_type", 2).over(w))
        .filter($"p2".isNotNull)
        .select(concat($"p2", lit(">"), $"p1", lit(">"), $"event_type")
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"path".asc)
        .limit(10)
    },
    Some("WITH l AS (SELECT event_type, " +
      "lag(event_type, 1) OVER fr AS p1, " +
      "lag(event_type, 2) OVER fr AS p2 FROM events " +
      "WINDOW fr AS (PARTITION BY user_id " +
      "ORDER BY epoch_ms(ts), event_id)) " +
      "SELECT p2 || '>' || p1 || '>' || event_type AS path, " +
      "count(*) AS cnt FROM l WHERE p2 IS NOT NULL " +
      "GROUP BY 1 ORDER BY cnt DESC, path ASC LIMIT 10"))

  // ------------------------------------------------------------------
  // agg_bitmap_distinct — bitmap-index distinct counting for BOUNDED
  // domains (the roaring-bitmap pattern a warehouse uses where
  // count-distinct state must stay O(1)): each active HOUR-OF-DAY maps
  // to one of 24 fixed bits, per-user masks fold with bit_or
  // (associative + commutative → any partition order), distinct
  // active hours = popcount, and the mask itself is the behavioral
  // signature the report groups by. Pure integer arithmetic end to
  // end; two chained aggs, each output orders of magnitude smaller
  // than its input.
  // ------------------------------------------------------------------

  private val aggBitmapDistinct = Q(
    "agg_bitmap_distinct",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id",
          expr("shiftleft(cast(1 as bigint), " +
            s"cast((${Det.fdivExpr("ms", "3600000")}) % 24 as int))").as("b"))
        .groupBy("user_id")
        .agg(bit_or($"b").as("mask"))
        .select($"user_id", $"mask", bit_count($"mask").cast("long")
          .as("n_hours"))
        .groupBy("mask", "n_hours")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("mask")
    },
    Some("WITH b AS (SELECT user_id, " +
      "(CAST(1 AS BIGINT) << CAST(epoch_ms(ts) // 3600000 % 24 AS INT)) " +
      "AS b FROM events), " +
      "m AS (SELECT user_id, bit_or(b) AS mask FROM b GROUP BY 1) " +
      "SELECT CAST(mask AS BIGINT) AS mask, " +
      "CAST(bit_count(mask) AS BIGINT) AS n_hours, " +
      "count(*) AS n_users FROM m GROUP BY 1, 2 ORDER BY 1"))

  // ------------------------------------------------------------------
  // seq_attribution_linear — linear multi-touch attribution (the
  // equal-split complement of seq_first_touch's winner-takes-all):
  // each purchase's value divides equally over the user's PRIOR
  // non-purchase touches, so a channel's credit is Σ v_p/k_p over the
  // (touch, purchase) pairs it appears in. Each quotient is rounded
  // to 6dp BEFORE the cross-pair sum, which then runs in exact
  // DECIMAL — order-independent on any cluster (the
  // sample_temperature normalization trick). The pair join is
  // user-keyed (touch sets are per-user bounded), never a cross-user
  // product.
  // ------------------------------------------------------------------

  private val seqAttributionLinear = Q(
    "seq_attribution_linear",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val touches = ev.filter($"event_type" =!= "purchase")
        .select($"user_id", $"event_type".as("channel"),
          $"ms".as("tms"), $"event_id".as("tid"))
      val purchases = ev
        .withColumn("k",
          count(when($"event_type" =!= "purchase", 1)).over(
            Window.partitionBy($"user_id")
              .orderBy($"ms".asc, $"event_id".asc)
              .rowsBetween(Window.unboundedPreceding, -1)))
        .filter($"event_type" === "purchase" && $"k" > 0)
        .select($"user_id", $"ms".as("pms"), $"event_id".as("pid"),
          round($"value" * 100).cast("long").as("vc"), $"k")
      touches.join(purchases, Seq("user_id"))
        .filter($"tms" < $"pms" ||
          ($"tms" === $"pms" && $"tid" < $"pid"))
        .select($"channel",
          dround($"vc".cast("double") / 100.0 / $"k", 6).cast(Dec)
            .as("credit"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_pairs"),
          dround(sum($"credit").cast("double"), 4).as("credit"))
        .orderBy("channel")
    },
    Some("WITH ev AS (SELECT user_id, event_id, event_type, " +
      "epoch_ms(ts) AS ms, CAST(round(value*100) AS BIGINT) AS vc " +
      "FROM events), " +
      "p AS (SELECT user_id, ms AS pms, event_id AS pid, vc, " +
      "count(CASE WHEN event_type <> 'purchase' THEN 1 END) OVER " +
      "(PARTITION BY user_id ORDER BY ms, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS k, " +
      "event_type FROM ev), " +
      "pp AS (SELECT user_id, pms, pid, vc, k FROM p " +
      "WHERE event_type = 'purchase' AND k > 0), " +
      "t AS (SELECT user_id, event_type AS channel, ms AS tms, " +
      "event_id AS tid FROM ev WHERE event_type <> 'purchase'), " +
      "pair AS (SELECT channel, CAST(" +
      OSql.sround("CAST(vc AS DOUBLE) / 100.0 / k", 6) +
      " AS DECIMAL(20,6)) AS credit FROM t JOIN pp USING (user_id) " +
      "WHERE tms < pms OR (tms = pms AND tid < pid)) " +
      "SELECT channel, count(*) AS n_pairs, " +
      OSql.sround("CAST(sum(credit) AS DOUBLE)", 4) + " AS credit " +
      "FROM pair GROUP BY 1 ORDER BY 1"))

  // ------------------------------------------------------------------
  // seq_attribution_time_decay — exponentially time-decayed multi-touch
  // attribution: the RECENCY-weighted member of the attribution family
  // (first_touch = winner-takes-all, linear = equal split; this one
  // halves a touch's claim per day of age, the industry-standard decay
  // rule). Weights are DYADIC — w = 2^(30−min(age_days, 30)) as an
  // exact integer via shiftleft, so the per-purchase weight total is
  // an exact BIGINT and the credit share vc·w/Σw is integer-exact up
  // to the ONE final division, 6dp-rounded BEFORE the cross-pair
  // DECIMAL sum (the seq_attribution_linear normalization trick —
  // order-independent on any cluster). Pair enumeration and the
  // per-purchase weight rollup are both user/purchase-keyed — bounded
  // baskets, never a cross-user product.
  // ------------------------------------------------------------------

  private val seqAttributionTimeDecay = Q(
    "seq_attribution_time_decay",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val touches = ev.filter($"event_type" =!= "purchase")
        .select($"user_id", $"event_type".as("channel"),
          $"ms".as("tms"), $"event_id".as("tid"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ms".as("pms"), $"event_id".as("pid"),
          round($"value" * 100).cast("long").as("vc"))
      val pairs = touches.join(purchases, Seq("user_id"))
        .filter($"tms" < $"pms" || ($"tms" === $"pms" && $"tid" < $"pid"))
        // integer div, not `/`: the double quotient truncates the same
        // way only while it stays exact; div is exact at any magnitude
        // (tms ≤ pms here, so trunc = floor)
        .withColumn("age",
          least(expr("(pms - tms) div 86400000"), lit(30L)).cast("long"))
        .withColumn("wq", expr("shiftleft(cast(1 as bigint), cast(30 - age as int))"))
      val totals = pairs.groupBy($"user_id", $"pid")
        .agg(sum($"wq").as("wt"))
      pairs.join(totals, Seq("user_id", "pid"))
        .select($"channel",
          dround($"vc".cast("double") * $"wq" / $"wt" / 100.0, 6).cast(Dec)
            .as("credit"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_pairs"),
          dround(sum($"credit").cast("double"), 4).as("credit"))
        .orderBy("channel")
    },
    Some("WITH ev AS (SELECT user_id, event_id, event_type, " +
      "epoch_ms(ts) AS ms, CAST(round(value*100) AS BIGINT) AS vc " +
      "FROM events), " +
      "t AS (SELECT user_id, event_type AS channel, ms AS tms, " +
      "event_id AS tid FROM ev WHERE event_type <> 'purchase'), " +
      "p AS (SELECT user_id, ms AS pms, event_id AS pid, vc FROM ev " +
      "WHERE event_type = 'purchase'), " +
      "pair AS (SELECT channel, user_id, pid, vc, " +
      "(CAST(1 AS BIGINT) << CAST(30 - least((pms - tms) // 86400000, 30) " +
      "AS INT)) AS wq FROM t JOIN p USING (user_id) " +
      "WHERE tms < pms OR (tms = pms AND tid < pid)), " +
      "tot AS (SELECT user_id, pid, CAST(SUM(wq) AS BIGINT) AS wt " +
      "FROM pair GROUP BY 1, 2), " +
      "cr AS (SELECT channel, CAST(" +
      OSql.sround("CAST(vc AS DOUBLE) * wq / wt / 100.0", 6) +
      " AS DECIMAL(20,6)) AS credit FROM pair JOIN tot USING (user_id, pid)) " +
      "SELECT channel, count(*) AS n_pairs, " +
      OSql.sround("CAST(sum(credit) AS DOUBLE)", 4) + " AS credit " +
      "FROM cr GROUP BY 1 ORDER BY 1"))

  // ------------------------------------------------------------------
  // agg_histogram_log2 — logarithmic (powers-of-two) value histogram
  // per event_type for long-tailed distributions, with the log2
  // bucket computed as length(bin(v)) — PURE INTEGER (a float
  // ln(v)/ln(2) sits exactly on the bucket edge at every power of two
  // — the cross-engine hazard this spelling dissolves). Counts and
  // exact cent sums collapse map-side to |types|·~16 rows.
  // ------------------------------------------------------------------

  private val aggHistogramLog2 = Q(
    "agg_histogram_log2",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"event_type",
          round($"value" * 100).cast("long").as("v"))
        .filter($"v" > 0)
        .withColumn("bucket", length(bin($"v")).cast("long"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("cnt"),
          sum($"v").cast("long").as("sum_cents"))
        .orderBy("event_type", "bucket")
    },
    Some("WITH b AS (SELECT event_type, " +
      "CAST(round(value*100) AS BIGINT) AS v FROM events) " +
      "SELECT event_type, CAST(length(bin(v)) AS BIGINT) AS bucket, " +
      "count(*) AS cnt, CAST(sum(v) AS BIGINT) AS sum_cents " +
      "FROM b WHERE v > 0 GROUP BY 1, 2 ORDER BY 1, 2"))

  // ------------------------------------------------------------------
  // feature_binning_transfer — the FITTED-TRANSFORMER pattern every ML
  // pipeline needs and naive SQL gets wrong: quartile bin edges are
  // LEARNED on the training era (even event_ids) and APPLIED unchanged
  // to the serving era (odd event_ids) — recomputing edges on serving
  // data would leak distribution shift into the features. Edges are
  // exact discrete quartiles (the value at rank ⌈p·n⌉ — the
  // agg_percentile_disc rule) per event_type, read off a PER-VALUE
  // COUNT LEDGER: value v's rank interval is (cum(v) − c(v), cum(v)],
  // and the edge is the value whose interval covers the target rank —
  // identical pick, but the only WindowExec runs over the bounded
  // (type, cents) ledger instead of funneling the training era's N/|types|
  // raw rows through one task per type (the round-8 discipline; the
  // cents domain is bounded by the value scale, not by N). The edges
  // collapse to a |types|-row broadcast; the serving era classifies
  // in a codegen'd CASE projection. Output: the serving-era bin ledger.
  // ------------------------------------------------------------------

  private val featureBinningTransfer = Q(
    "feature_binning_transfer",
    (s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
        .select($"event_type", ($"event_id" % 2).as("era"), $"event_id",
          round($"value" * 100).cast("long").as("v"))
      val train = e.filter($"era" === 0)
      val counts = train.groupBy($"event_type", $"v").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy($"event_type").orderBy($"v".asc)
      val cum = counts.withColumn("hi", sum($"c").over(w))
      val n = counts.groupBy("event_type").agg(sum($"c").as("n"))
      def edge(num: Int, den: Int) = {
        val target = ceil(lit(num) * $"n" / lit(den))
        max(when($"hi" - $"c" < target && target <= $"hi", $"v"))
      }
      val edges = cum.join(broadcast(n), "event_type")
        .groupBy("event_type").agg(
          edge(1, 4).as("q1"), edge(1, 2).as("q2"), edge(3, 4).as("q3"))
      e.filter($"era" === 1)
        .join(broadcast(edges), "event_type")
        .withColumn("bin",
          when($"v" <= $"q1", 0L).when($"v" <= $"q2", 1L)
            .when($"v" <= $"q3", 2L).otherwise(3L))
        .groupBy("event_type", "bin").agg(
          count(lit(1)).as("n"),
          sum($"v").as("v_sum"))
        .orderBy("event_type", "bin")
    },
    Some("WITH e AS (SELECT event_type, event_id % 2 AS era, event_id, " +
      "CAST(round(value*100) AS BIGINT) AS v FROM events), " +
      "tr AS (SELECT event_type, v, " +
      "row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn, " +
      "COUNT(*) OVER (PARTITION BY event_type) AS n FROM e WHERE era = 0), " +
      "edges AS (SELECT event_type, " +
      "max(CASE WHEN rn * 4 >= n AND (rn - 1) * 4 < n THEN v END) AS q1, " +
      "max(CASE WHEN rn * 2 >= n AND (rn - 1) * 2 < n THEN v END) AS q2, " +
      "max(CASE WHEN rn * 4 >= n * 3 AND (rn - 1) * 4 < n * 3 THEN v END) AS q3 " +
      "FROM tr GROUP BY 1) " +
      "SELECT e.event_type, " +
      "CAST(CASE WHEN v <= q1 THEN 0 WHEN v <= q2 THEN 1 " +
      "WHEN v <= q3 THEN 2 ELSE 3 END AS BIGINT) AS bin, " +
      "count(*) AS n, CAST(SUM(v) AS BIGINT) AS v_sum " +
      "FROM e JOIN edges ON edges.event_type = e.event_type " +
      "WHERE era = 1 GROUP BY 1, 2 ORDER BY 1, 2"))

  // ------------------------------------------------------------------
  // feature_recency — the recency feature (time since the user's last
  // purchase STRICTLY BEFORE each event) every churn/propensity model
  // starts from: a conditional IGNORE-NULLS last() over the exclusive
  // trailing frame carries the previous purchase's timestamp forward,
  // and the difference is exact integer milliseconds (NULL before the
  // first purchase — no sentinel values). One user-keyed window.
  // ------------------------------------------------------------------

  private val featureRecency = Q(
    "feature_recency",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ms".asc, $"event_id".asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select($"user_id", $"ms", $"event_id", $"event_type")
        .withColumn("prev_purchase_ms",
          last(when($"event_type" === "purchase", $"ms"), ignoreNulls = true)
            .over(w))
        .select($"user_id", $"ms", $"event_id",
          ($"ms" - $"prev_purchase_ms").as("recency_ms"))
        .orderBy("user_id", "ms", "event_id")
    },
    Some("SELECT user_id, ms, event_id, ms - prev_purchase_ms AS recency_ms " +
      "FROM (SELECT user_id, epoch_ms(ts) AS ms, event_id, " +
      "last_value(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END " +
      "IGNORE NULLS) OVER (PARTITION BY user_id " +
      "ORDER BY epoch_ms(ts), event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_ms " +
      "FROM events) ORDER BY user_id, ms, event_id"))

  // ------------------------------------------------------------------
  // feature_woe_iv — Weight of Evidence / Information Value: the
  // credit-scoring-style screen for how well a categorical feature
  // (here the value quartile bucket) separates a binary target (the
  // `eval_binary_classifier` purchase label). WoE_g = ln(good_g/G) −
  // ln(bad_g/B) per bucket; IV = Σ_g (good_g/G − bad_g/B)·WoE_g ranks
  // the feature (< 0.02 useless, > 0.3 strong). Exactness: counts
  // collapse MAP-SIDE to ≤4 bucket rows; WoE is spelled (ln good_g +
  // ln B) − (ln bad_g + ln G) — each ln on a positive exact integer
  // (correctly-rounded libm both engines), never a ratio and never an
  // overflowing product; each bucket's IV term is quantized at 10⁹
  // BEFORE the cross-bucket sum. A bucket with a zero cell emits NULL
  // WoE and contributes zero to IV (the standard guard against ±inf),
  // visible in the output rather than silently smoothed. NULL values
  // are excluded up front in both engines (a NULL would otherwise land
  // in the top bucket via the CASE fallthrough).
  // ------------------------------------------------------------------

  private val featureWoeIv = Q(
    "feature_woe_iv",
    (s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
        .filter($"value".isNotNull)
        .select(($"event_type" === "purchase").cast("long").as("y"),
          round($"value" * 100).cast("long").as("v"))
        .select($"y",
          when($"v" < 2500, 0L).when($"v" < 5000, 1L)
            .when($"v" < 7500, 2L).otherwise(3L).as("bucket"))
      val g = e.groupBy("bucket").agg(
        sum($"y").as("n_good"), sum(lit(1L) - $"y").as("n_bad"))
      val tot = g.agg(sum($"n_good").as("gg"), sum($"n_bad").as("bb"))
      val w = g.crossJoin(broadcast(tot))
        .withColumn("woe",
          when($"n_good" > 0 && $"n_bad" > 0 && $"gg" > 0 && $"bb" > 0,
            log($"n_good".cast("double")) + log($"bb".cast("double"))
              - (log($"n_bad".cast("double")) + log($"gg".cast("double")))))
        .withColumn("ivq",
          when($"woe".isNotNull,
            floor(($"n_good".cast("double") / $"gg"
              - $"n_bad".cast("double") / $"bb") * $"woe" * 1e9 + 0.5)
              .cast("long"))
            .otherwise(lit(0L)))
      val iv = w.agg((sum($"ivq").cast("double") / 1e9).as("iv"))
      w.crossJoin(broadcast(iv))
        .select($"bucket", $"n_good", $"n_bad",
          dround($"woe", 6).as("woe"), dround($"iv", 6).as("iv"))
        .orderBy("bucket")
    },
    Some("WITH e AS (SELECT CAST(event_type = 'purchase' AS BIGINT) AS y, " +
      "CAST(round(value*100) AS BIGINT) AS v FROM events " +
      "WHERE value IS NOT NULL), " +
      "e2 AS (SELECT y, CAST(CASE WHEN v < 2500 THEN 0 WHEN v < 5000 THEN 1 " +
      "WHEN v < 7500 THEN 2 ELSE 3 END AS BIGINT) AS bucket FROM e), " +
      "g AS (SELECT bucket, CAST(SUM(y) AS BIGINT) AS n_good, " +
      "CAST(SUM(1 - y) AS BIGINT) AS n_bad FROM e2 GROUP BY 1), " +
      "tot AS (SELECT CAST(SUM(n_good) AS BIGINT) AS gg, " +
      "CAST(SUM(n_bad) AS BIGINT) AS bb FROM g), " +
      "w AS (SELECT bucket, n_good, n_bad, " +
      "CASE WHEN n_good > 0 AND n_bad > 0 AND gg > 0 AND bb > 0 THEN " +
      "ln(CAST(n_good AS DOUBLE)) + ln(CAST(bb AS DOUBLE)) " +
      "- (ln(CAST(n_bad AS DOUBLE)) + ln(CAST(gg AS DOUBLE))) END AS woe, " +
      "gg, bb FROM g CROSS JOIN tot), " +
      "w2 AS (SELECT w.*, CASE WHEN woe IS NOT NULL THEN " +
      "CAST(floor((CAST(n_good AS DOUBLE) / gg " +
      "- CAST(n_bad AS DOUBLE) / bb) * woe * 1e9 + 0.5) AS BIGINT) " +
      "ELSE 0 END AS ivq FROM w), " +
      "iv AS (SELECT CAST(SUM(ivq) AS DOUBLE) / 1e9 AS iv FROM w2) " +
      "SELECT bucket, n_good, n_bad, " + OSql.sround("woe", 6) + " AS woe, " +
      OSql.sround("iv", 6) + " AS iv FROM w2 CROSS JOIN iv ORDER BY bucket"))

  val qs: Seq[Q] = Seq(
    aggOls2, featureMinmaxScale, textHashingTrick, seqTrigramPaths,
    aggBitmapDistinct, seqAttributionLinear, aggHistogramLog2,
    featureBinningTransfer, featureRecency, featureWoeIv,
    seqAttributionTimeDecay)
}

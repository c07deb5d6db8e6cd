package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, OSql, Q, Tables}

/** Scalar-function surface: string / date / math / json / array / map /
  * higher-order / UDF (SURVEY.md §2.2). Everything except `udf_scalar`
  * stays inside whole-stage codegen (no black-box functions on the hot
  * path); the UDF exists precisely to exercise the UDF surface.
  */
object Scalars {
  import Det._

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  private val scalarString = Q(
    "scalar_string",
    (s, d) => {
      import s.implicits._
      t(s, d, "part")
        .select($"p_partkey",
          upper($"p_name").as("name_u"),
          lower($"p_brand").as("brand_l"),
          substring($"p_name", 1, 5).as("name5"),
          length($"p_name").cast("long").as("name_len"),
          lpad($"p_brand", 12, "*").as("brand_pad"),
          concat_ws("#", $"p_brand", $"p_type").as("brand_type"),
          expr("split_part(p_name, ' ', 1)").as("first_tok"),
          expr("replace(p_type, ' ', '-')").as("type_r"))
        .orderBy("p_partkey")
        .limit(500)
    },
    Some("SELECT p_partkey, upper(p_name) AS name_u, lower(p_brand) AS brand_l, " +
      "substring(p_name, 1, 5) AS name5, CAST(length(p_name) AS BIGINT) AS name_len, " +
      "lpad(p_brand, 12, '*') AS brand_pad, concat_ws('#', p_brand, p_type) AS brand_type, " +
      "split_part(p_name, ' ', 1) AS first_tok, replace(p_type, ' ', '-') AS type_r " +
      "FROM part ORDER BY p_partkey LIMIT 500"))

  /** Regex-extract surface — capture groups and match counting, the
    * log-parsing primitives (A3-adjacent): group extraction from the
    * three-word type field and a vowel-run count. Patterns use only
    * constructs Java regex and RE2 agree on (character classes,
    * bounded groups — no backreferences/lookaround), the same rule
    * the PII masks follow.
    */
  private val scalarRegex = Q(
    "scalar_regex",
    (s, d) => {
      import s.implicits._
      t(s, d, "part")
        .select($"p_partkey",
          regexp_extract($"p_type", "(\\w+) (\\w+) (\\w+)", 2).as("mid_word"),
          regexp_extract($"p_type", "^(\\w+)", 1).as("first_word"),
          regexp_count($"p_name", lit("[aeiou]+")).cast("long").as("vowel_runs"))
        .orderBy("p_partkey")
        .limit(500)
    },
    Some("SELECT p_partkey, " +
      "regexp_extract(p_type, '(\\w+) (\\w+) (\\w+)', 2) AS mid_word, " +
      "regexp_extract(p_type, '^(\\w+)', 1) AS first_word, " +
      "CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS vowel_runs " +
      "FROM part ORDER BY p_partkey LIMIT 500"))

  /** Bitwise surface — the integer ops key-hashing, bucketing, and
    * bitmap tricks are built from: AND/OR/XOR, shifts, and popcount,
    * all exact BIGINT arithmetic both engines define identically. The
    * xor mixes two key columns (the cheap key-combining trick
    * composite routing uses); popcount over the masked key is the
    * bit-sampling primitive SimHash-family code relies on. Pure
    * codegen projection, no shuffle but the output sort.
    */
  private val scalarBitwise = Q(
    "scalar_bitwise",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .select($"o_orderkey",
          $"o_orderkey".bitwiseAND(lit(255L)).as("band"),
          $"o_orderkey".bitwiseOR(lit(4096L)).as("bor"),
          $"o_orderkey".bitwiseXOR($"o_custkey").as("bxor"),
          shiftleft($"o_orderkey", 2).as("shl"),
          shiftright($"o_orderkey", 3).as("shr"),
          bit_count($"o_orderkey".bitwiseAND(lit(0xFFFFL))).cast("long").as("bits"))
        .orderBy("o_orderkey")
        .limit(500)
    },
    Some("SELECT o_orderkey, o_orderkey & 255 AS band, o_orderkey | 4096 AS bor, " +
      "xor(o_orderkey, o_custkey) AS bxor, (o_orderkey << 2) AS shl, " +
      "(o_orderkey >> 3) AS shr, " +
      "CAST(bit_count(o_orderkey & 65535) AS BIGINT) AS bits " +
      "FROM orders ORDER BY o_orderkey LIMIT 500"))

  /** Date surface. Spark dayofweek is 1=Sunday..7; DuckDB's is
    * 0=Sunday..6 — the oracle adds 1. Epoch seconds via floor(epoch())
    * = unix_timestamp truncation for post-1970 data.
    */
  private val scalarDate = Q(
    "scalar_date",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .select($"o_orderkey",
          year($"o_orderdate").cast("long").as("yr"),
          month($"o_orderdate").cast("long").as("mo"),
          dayofweek($"o_orderdate").cast("long").as("dow"),
          to_date(date_trunc("month", $"o_orderdate")).cast("string").as("month_start"),
          date_add(to_date($"o_orderdate"), 30).cast("string").as("plus30"),
          datediff(lit("1998-01-01").cast("date"), to_date($"o_orderdate"))
            .cast("long").as("days_to_98"),
          unix_timestamp($"o_orderdate").as("epoch_s"))
        .orderBy("o_orderkey")
        .limit(1000)
    },
    Some("SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr, " +
      "CAST(month(o_orderdate) AS BIGINT) AS mo, " +
      "CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow, " +
      "CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start, " +
      "CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30, " +
      "CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98, " +
      "CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s " +
      "FROM orders ORDER BY o_orderkey LIMIT 1000"))

  /** Math surface. sqrt is IEEE-exact; ln/pow go through libm and are
    * floor-rounded to 4dp where last-ulp drift cannot surface.
    */
  private val scalarMath = Q(
    "scalar_math",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          dround(sqrt($"l_extendedprice"), 4).as("sqrt_price"),
          dround(pow($"l_quantity", 2), 2).as("qty_sq"),
          dround(abs($"l_discount" - 0.05), 4).as("disc_dev"),
          ceil($"l_extendedprice").cast("long").as("price_ceil"),
          floor($"l_extendedprice").cast("long").as("price_floor"),
          dround(log($"l_extendedprice"), 4).as("ln_price"),
          greatest($"l_tax", $"l_discount").as("hi"),
          least($"l_tax", $"l_discount").as("lo"),
          signum($"l_discount" - 0.04).cast("long").as("sgn"))
        .orderBy("l_orderkey", "l_linenumber", "sqrt_price", "qty_sq",
          "disc_dev", "price_ceil", "price_floor", "ln_price", "hi", "lo", "sgn")
        .limit(1000)
    },
    Some("SELECT l_orderkey, l_linenumber, " +
      OSql.sround("sqrt(l_extendedprice)", 4) + " AS sqrt_price, " +
      OSql.sround("power(l_quantity, 2)", 2) + " AS qty_sq, " +
      OSql.sround("abs(l_discount - 0.05)", 4) + " AS disc_dev, " +
      "CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil, " +
      "CAST(floor(l_extendedprice) AS BIGINT) AS price_floor, " +
      OSql.sround("ln(l_extendedprice)", 4) + " AS ln_price, " +
      "greatest(l_tax, l_discount) AS hi, least(l_tax, l_discount) AS lo, " +
      "CAST(sign(l_discount - 0.04) AS BIGINT) AS sgn " +
      "FROM lineitem ORDER BY l_orderkey, l_linenumber, sqrt_price, qty_sq, " +
      "disc_dev, price_ceil, price_floor, ln_price, hi, lo, sgn LIMIT 1000"))

  private val scalarCaseJson = Q(
    "scalar_case_json",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(get_json_object($"props", "$.k").cast("int").as("k"))
        .select(when($"k" < 25, "low").when($"k" < 50, "mid")
          .when($"k" < 75, "high").otherwise("top").as("bucket"), $"k")
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), sum($"k").cast("long").as("sum_k"))
        .orderBy("bucket")
    },
    Some("WITH j AS (SELECT CAST(props->>'$.k' AS INT) AS k FROM events) " +
      "SELECT CASE WHEN k < 25 THEN 'low' WHEN k < 50 THEN 'mid' " +
      "WHEN k < 75 THEN 'high' ELSE 'top' END AS bucket, " +
      "count(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k FROM j GROUP BY 1 ORDER BY 1"))

  private val arrayOps = Q(
    "array_ops",
    (s, d) => {
      import s.implicits._
      t(s, d, "embeddings")
        .select($"vec_id",
          size($"embedding").cast("long").as("dim"),
          dround(try_element_at($"embedding", lit(1)).cast("double"), 6).as("first_val"),
          dround(array_min(slice($"embedding", 1, 8)).cast("double"), 6).as("min8"),
          dround(array_max(slice($"embedding", 1, 8)).cast("double"), 6).as("max8"))
        .orderBy("vec_id")
        .limit(500)
    },
    Some("SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, " +
      OSql.sround("CAST(embedding[1] AS DOUBLE)", 6) + " AS first_val, " +
      OSql.sround("CAST(list_min(embedding[1:8]) AS DOUBLE)", 6) + " AS min8, " +
      OSql.sround("CAST(list_max(embedding[1:8]) AS DOUBLE)", 6) + " AS max8 " +
      "FROM embeddings ORDER BY vec_id LIMIT 500"))

  /** Generator/UDTF surface: posexplode. Spark pos is 0-based; DuckDB
    * generate_subscripts is 1-based — the oracle subtracts 1.
    */
  private val arrayExplode = Q(
    "array_explode",
    (s, d) => {
      import s.implicits._
      t(s, d, "embeddings")
        .select($"label".cast("long").as("label"), posexplode($"embedding").as(Seq("pos", "x")))
        .filter($"pos" < 4)
        .groupBy($"label", $"pos".cast("long").as("pos"))
        .agg(dround(avg($"x".cast("double")), 6).as("avg_x"))
        .orderBy("label", "pos")
    },
    Some("SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS pos, " +
      OSql.sround("AVG(CAST(x AS DOUBLE))", 6) + " AS avg_x FROM " +
      "(SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i " +
      "FROM embeddings) WHERE i <= 4 GROUP BY 1, 2 ORDER BY 1, 2"))

  /** OUTER generator semantics — the explode variant ingest code
    * actually needs: a row whose derived array is EMPTY must survive
    * the flatten (with a null element), not vanish — losing it would
    * silently drop documents from a pipeline keyed on the exploded
    * side. The array is genuinely data-dependent (name tokens
    * filtered by prefix, often empty); the profile (rows, null-rows,
    * distinct tokens) pins conservation: every part contributes ≥1
    * row. DuckDB has no unnest-outer, so the oracle restates it as
    * CASE-to-[NULL] before unnest — same semantics, hash-checked.
    */
  private val arrayExplodeOuter = Q(
    "array_explode_outer",
    (s, d) => {
      import s.implicits._
      t(s, d, "part")
        .select($"p_partkey",
          expr("filter(split(p_name, ' '), x -> x LIKE 'a%')").as("atoks"))
        .select($"p_partkey", explode_outer($"atoks").as("tok"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when($"tok".isNull, 1L).otherwise(0L)).as("n_empty"),
          countDistinct($"tok").as("n_distinct"))
    },
    Some("WITH a AS (SELECT p_partkey, " +
      "list_filter(string_split(p_name, ' '), x -> x LIKE 'a%') AS atoks FROM part), " +
      "x AS (SELECT p_partkey, unnest(CASE WHEN len(atoks) = 0 " +
      "THEN [CAST(NULL AS VARCHAR)] ELSE atoks END) AS tok FROM a) " +
      "SELECT count(*) AS n_rows, " +
      "CAST(SUM(CASE WHEN tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_empty, " +
      "count(DISTINCT tok) AS n_distinct FROM x"))

  /** Catalyst higher-order functions (lambdas): transform + aggregate.
    * The fold runs in array order in both engines → deterministic.
    */
  private val higherOrderFn = Q(
    "higher_order_fn",
    (s, d) => {
      import s.implicits._
      t(s, d, "embeddings")
        .select($"vec_id",
          dround(try_element_at(transform($"embedding", x => x.cast("double") * lit(2.0)), lit(2)), 6)
            .as("x2_second"),
          dround(aggregate($"embedding", lit(0.0),
            (acc, x) => acc + abs(x.cast("double"))), 6).as("l1"))
        .orderBy("vec_id")
    },
    Some("SELECT vec_id, " +
      OSql.sround("list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)[2]", 6) +
      " AS x2_second, " +
      OSql.sround("list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'sum')", 6) +
      " AS l1 FROM embeddings ORDER BY vec_id"))

  /** Scala UDF surface (business-rule bucket). The oracle re-states the
    * same rule as a CASE expression.
    */
  private val udfScalar = Q(
    "udf_scalar",
    (s, d) => {
      import s.implicits._
      val bucket = udf((seg: String) =>
        if (seg == null) "na"
        else if (seg.startsWith("B")) "b-tier"
        else if (seg.length > 9) "long"
        else "other")
      t(s, d, "customer")
        .select(bucket($"c_mktsegment").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    },
    Some("SELECT CASE WHEN c_mktsegment IS NULL THEN 'na' " +
      "WHEN c_mktsegment LIKE 'B%' THEN 'b-tier' " +
      "WHEN length(c_mktsegment) > 9 THEN 'long' ELSE 'other' END AS bucket, " +
      "count(*) AS cnt FROM customer GROUP BY 1 ORDER BY 1"))

  /** MapType surface: per-user map(event_type → count) built with
    * map_from_entries over a SORTED entry list (collect_list order is
    * nondeterministic; sort_array fixes it), re-projected to delimited
    * strings so the oracle compare is engine-portable (map ordering is
    * otherwise unstable across engines — SURVEY §2.2).
    */
  private val mapOps = Q(
    "map_ops",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("cnt"))
        .groupBy($"user_id")
        .agg(map_from_entries(sort_array(collect_list(struct($"event_type", $"cnt"))))
          .as("m"))
        .select($"user_id",
          size($"m").cast("long").as("n_types"),
          concat_ws(",", map_keys($"m")).as("types"),
          concat_ws(",", transform(map_values($"m"), v => v.cast("string"))).as("type_counts"))
        .orderBy("user_id")
    },
    Some("WITH c AS (SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2) " +
      "SELECT user_id, count(*) AS n_types, " +
      "string_agg(event_type, ',' ORDER BY event_type) AS types, " +
      "string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY event_type) AS type_counts " +
      "FROM c GROUP BY 1 ORDER BY 1"))

  /** ANSI-safe scalar surface: Spark 4 runs ANSI mode by default, where
    * a divide-by-zero / bad cast / overflow THROWS mid-query — at 100 TB
    * one malformed row four hours in kills the job. The `try_` family is
    * the row-level containment story: the failing row degrades to NULL
    * and the pipeline keeps moving (the scalar cousin of the NDJSON
    * dead-letter path). try_divide → NULL at the qty=24 singularity;
    * try_cast('R' as int) → NULL always (DuckDB TRY_CAST agrees);
    * try_add(k, Long.MaxValue) overflows → NULL exactly when k > 0 —
    * the oracle restates that rule with a guarded CASE (DuckDB has no
    * try_add; its BIGINT overflow raises).
    */
  private val scalarTrySafe = Q(
    "scalar_try_safe",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select($"l_returnflag",
          expr("try_divide(l_extendedprice, l_quantity - 24.0D)").as("safe_div"),
          expr("try_cast(l_returnflag AS INT)").as("safe_cast"),
          expr("try_add(l_orderkey, 9223372036854775807L)").as("safe_add"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          (count(lit(1)) - count($"safe_div")).as("div_nulls"),
          moneySum(coalesce($"safe_div", lit(0.0))).as("sum_safe_div"),
          count($"safe_cast").as("cast_ok"),
          count($"safe_add").as("add_ok"))
        .orderBy("l_returnflag")
    },
    Some("WITH t AS (SELECT l_returnflag, " +
      "l_extendedprice / nullif(l_quantity - 24.0, 0) AS safe_div, " +
      "TRY_CAST(l_returnflag AS INT) AS safe_cast, " +
      "CASE WHEN l_orderkey > 0 THEN NULL " +
      "ELSE l_orderkey + 9223372036854775807 END AS safe_add FROM lineitem) " +
      "SELECT l_returnflag, count(*) AS cnt, " +
      "count(*) - count(safe_div) AS div_nulls, " +
      OSql.msum("coalesce(safe_div, 0)") + " AS sum_safe_div, " +
      "count(safe_cast) AS cast_ok, count(safe_add) AS add_ok " +
      "FROM t GROUP BY 1 ORDER BY 1"))

  /** Calendar arithmetic beyond `scalar_date`'s extract/trunc/diff
    * family: month-relative operations whose CLAMPING semantics both
    * engines define identically (Jan 31 + 1 month = the last day of
    * February), last-of-month, and quarter — the fiscal-reporting
    * scalar surface. Pure codegen projection + map-side agg.
    */
  private val scalarCalendar = Q(
    "scalar_calendar",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .select($"o_orderkey",
          // dates ship as ISO strings — the engine-portable carrier the
          // determinism rules (SURVEY §2.3) require for calendar values
          add_months($"o_orderdate".cast("date"), 1).cast("string").as("next_month"),
          last_day($"o_orderdate".cast("date")).cast("string").as("month_end"),
          quarter($"o_orderdate").cast("long").as("qtr"),
          (dayofmonth(last_day($"o_orderdate".cast("date"))) -
            dayofmonth($"o_orderdate")).cast("long").as("days_to_eom"))
        .orderBy("o_orderkey")
        .limit(500)
    },
    Some("SELECT o_orderkey, " +
      "CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) " +
      "AS VARCHAR) AS next_month, " +
      "CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end, " +
      "CAST(quarter(o_orderdate) AS BIGINT) AS qtr, " +
      "CAST(day(last_day(CAST(o_orderdate AS DATE))) " +
      "- day(CAST(o_orderdate AS DATE)) AS BIGINT) AS days_to_eom " +
      "FROM orders ORDER BY o_orderkey LIMIT 500"))

  /** Geometric mean per event_type — the right central tendency for
    * ratio/growth-shaped values, exp(mean(ln v)): each ln term
    * quantizes to BIGINT·10⁹ before the sum (order-independent), and
    * the one exp() call runs on an identical double in both engines.
    */
  private val aggGeomean = Q(
    "agg_geomean",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"event_type",
          (round($"value" * 100).cast("long") / lit(100.0)).as("v"))
        .filter($"v" > 0)
        .withColumn("t", floor(log($"v") * lit(1e9) + lit(0.5)).cast("long"))
        .groupBy("event_type").agg(
          count(lit(1)).as("n"),
          dround(exp((sum($"t") / lit(1e9)) / count(lit(1))), 6).as("geomean"))
        .orderBy("event_type")
    },
    Some("WITH e AS (SELECT event_type, " +
      "CAST(round(value*100) AS BIGINT) / 100.0 AS v FROM events), " +
      "t AS (SELECT event_type, " +
      "CAST(floor(ln(v) * 1e9 + 0.5) AS BIGINT) AS t FROM e WHERE v > 0) " +
      "SELECT event_type, count(*) AS n, " +
      OSql.sround("exp((SUM(t) / 1e9) / count(*))", 6) + " AS geomean " +
      "FROM t GROUP BY 1 ORDER BY 1"))

  val qs: Seq[Q] = Seq(
    scalarString, scalarDate, scalarMath, scalarCaseJson,
    arrayOps, arrayExplode, arrayExplodeOuter, higherOrderFn, udfScalar,
    mapOps, scalarTrySafe, scalarBitwise, scalarRegex, scalarCalendar,
    aggGeomean)
}

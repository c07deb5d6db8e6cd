package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, Mat, OSql, Q, Tables}

/** Graph mining, behavioral pattern matching, and recommendation-prep
  * operators: BFS hop distances, Adamic-Adar link prediction,
  * regex-over-sequence behavior detection, and deterministic negative
  * sampling. All hash-verified against DuckDB.
  *
  * Scale shape (the 100 TB stance, per operator):
  *  - graph_bfs_depth: each BFS round is ONE edges ⋈ frontier equi-join
  *    plus a groupBy-min — the same co-partitioned join-per-superstep
  *    shape as `graph_pagerank`; round count is the fixed search radius,
  *    state is (node, dist) pairs only.
  *  - graph_adamic_adar: pair candidates come from WITHIN-basket
  *    self-joins (a basket = one order's distinct parts, bounded by
  *    order size), so the blow-up is Σ|basket|² — linear in orders for
  *    bounded baskets — never a relation-level cross join; each
  *    common-neighbor weight 1/ln(deg) is integer-quantized before the
  *    exact per-pair BIGINT sum, and the final top-20 is a TakeOrdered
  *    (O(k) per partition), not a global sort.
  *  - seq_pattern_regex: one user-keyed shuffle builds each user's
  *    time-ordered type-initial string (bounded per user); the regex
  *    scan is a codegen'd projection; the match histogram collapses
  *    map-side.
  *  - sample_negative: the ≤50-value bucket domain broadcasts as ONE
  *    collected array and each user's pick is a map-side
  *    array_except + md5-keyed struct sort + slice — deterministic
  *    under re-runs and repartitioning, no RNG state, no candidate
  *    grid, no anti join (the grid shape measured 33× at sf0.1→sf1).
  */
object MiningOps {
  import Det._

  // ------------------------------------------------------------------
  // graph_bfs_depth — BFS hop distances over the bipartite user ↔
  // event-type interaction graph (the `graph_pagerank` edge list) from
  // the 'purchase' type node, search radius 4 (covers the bipartite
  // diameter here: types sit at even depth, users at odd). Each round
  // relaxes dist(n) = min(dist(n), min over in-edges dist(m)+1) — pure
  // integer arithmetic, bit-identical in any engine; the oracle unrolls
  // the same four rounds as CTEs. Output is the reachability histogram
  // (nodes per depth), the compact summary that stays bounded at any
  // graph size.
  // ------------------------------------------------------------------

  /** The shared 4-round seeded BFS relaxation over the bipartite
    * user↔type graph ([[graphBfsDepth]] histograms it;
    * [[graphClosenessSeeded]] reduces it to centralities). The edge
    * list and each round's (node, dist) table are lineage-cut with
    * eager materialization — `dist` feeds BOTH the relax join and the
    * union each round, so left lazy the logical tree doubles per round
    * (2⁴ copies of the base by round 4: quadratic planning and, when
    * exchange reuse misses, re-execution); the per-round table is
    * node-bounded, the same per-round discipline as
    * LlmPipeline.connectedComponents.
    *
    * The EDGE list, unlike the dist tables, is O(distinct user↔type
    * pairs) — unbounded in users — and `localCheckpoint` storage is
    * executor-local and non-replicated (an executor loss after the
    * checkpoint has no recompute path). So the materialization is
    * size-gated on the archive (r15 VERDICT ask #9, [[Mat.gated]]):
    * small corpora keep the in-memory checkpoint, anything above the
    * threshold spills the edge list to scratch parquet (fault-
    * tolerant, re-readable lineage) instead.
    */
  private def bfsDist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.events(s, d)
      .select(concat(lit("u:"), $"user_id".cast("string")).as("src"),
        concat(lit("t:"), $"event_type").as("dst"))
      .distinct()
    val edges = Mat.gated(s,
      pairs.unionByName(pairs.select($"dst".as("src"), $"src".as("dst"))),
      "bfs-edges", s"$d/events.parquet")
    var dist = s.range(1).select(lit("t:purchase").as("node"), lit(0L).as("dist"))
    for (_ <- 1 to 4) {
      val relaxed = edges.join(dist, edges("src") === dist("node"))
        .select($"dst".as("node"), ($"dist" + 1).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min($"dist").as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  private val graphBfsDepth = Q(
    "graph_bfs_depth",
    (s, d) => {
      import s.implicits._
      bfsDist(s, d).groupBy("dist").agg(count(lit(1)).as("n_nodes"))
        .orderBy("dist")
    },
    Some("WITH pairs AS (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src, " +
      "'t:' || event_type AS dst FROM events), " +
      "edges AS (SELECT src, dst FROM pairs " +
      "UNION ALL SELECT dst, src FROM pairs), " +
      "d0 AS (SELECT 't:purchase' AS node, CAST(0 AS BIGINT) AS dist), " +
      "d1 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d0 " +
      "UNION ALL SELECT e.dst, d.dist + 1 FROM edges e " +
      "JOIN d0 d ON e.src = d.node) GROUP BY 1), " +
      "d2 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d1 " +
      "UNION ALL SELECT e.dst, d.dist + 1 FROM edges e " +
      "JOIN d1 d ON e.src = d.node) GROUP BY 1), " +
      "d3 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d2 " +
      "UNION ALL SELECT e.dst, d.dist + 1 FROM edges e " +
      "JOIN d2 d ON e.src = d.node) GROUP BY 1), " +
      "d4 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d3 " +
      "UNION ALL SELECT e.dst, d.dist + 1 FROM edges e " +
      "JOIN d3 d ON e.src = d.node) GROUP BY 1) " +
      "SELECT dist, count(*) AS n_nodes FROM d4 GROUP BY 1 ORDER BY 1"))

  // ------------------------------------------------------------------
  // graph_adamic_adar — Adamic-Adar link prediction over the bipartite
  // part ↔ order graph: two parts co-appearing in orders are scored
  // Σ over common orders of 1/ln(|order's parts|) — frequent
  // co-purchases through SMALL baskets score higher than through big
  // ones (the classic common-neighbor downweighting). Candidate pairs
  // enumerate WITHIN each order (bounded basket), order degree ≥ 2 for
  // any pair so ln(deg) > 0; each weight quantizes to BIGINT·10⁹
  // before the exact per-pair sum. Top-20 by (score desc, pa, pb) —
  // fully tie-broken.
  // ------------------------------------------------------------------

  /** The within-order co-purchase PAIR enumeration — the RAW input of
    * the [[coCounts]] statistics build, one row per order-local
    * canonical part pair (o, a < b) with the order's basket degree
    * `dg` (Adamic-Adar's downweight) and each endpoint part's
    * distinct-order degree `da`/`db` (Jaccard's normalizer, attached
    * to the LINEAR li relation before the basket self-join so the
    * Σ|basket|² relation never re-joins a degree table). Blow-up is
    * Σ|basket|², bounded baskets ⇒ linear in orders, never a
    * relation-level cross join (TPC-H pins |basket| ≤ 7; a data model
    * with unbounded baskets would make Σ|basket|² super-linear and
    * needs a basket cap upstream). NOT materialized on its own: the
    * multi-pair enumeration exists only inside the one aggregation
    * that collapses it.
    */
  private def coPairsRaw(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.t(s, d, "lineitem")
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
    val deg = li.groupBy("o").agg(count(lit(1)).as("dg"))
    val pdeg = li.groupBy("p").agg(count(lit(1)).as("dp"))
    val liw = li.join(pdeg, "p").select($"o", $"p", $"dp")
    liw.select($"o", $"p".as("a"), $"dp".as("da"))
      .join(liw.select($"o", $"p".as("b"), $"dp".as("db")), "o")
      .filter($"a" < $"b")
      .join(deg, "o")
      .select("o", "a", "b", "dg", "da", "db")
  }

  /** The AGGREGATED co-occurrence statistics table — the materialized
    * index the whole co-purchase family reads: one row per canonical
    * simple pair (a < b) carrying the intersection count, both
    * endpoint degrees, and the Adamic-Adar integer score sum. This —
    * not the pair ENUMERATION — is the right artifact boundary: the
    * Σ|basket|² multi-pair relation exists only inside this build's
    * one groupBy (ledgered as staging, paid once per corpus), and
    * every consumer then reads a distinct-pair-sized table. The sf10
    * leg measured the alternative: consumers aggregating the staged
    * 10×-grown enumeration re-paid a ~90M-row shuffle per key
    * (graph_jaccard_neighbors 14× / graph_adamic_adar 11× for 10×
    * data — hash-agg spill past the fixed 32-partition layout), where
    * the statistics read is scan-linear.
    */
  private def coCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.core.IndexCache(s, s"co-counts|$d",
      coPairsRaw(s, d)
        // Adamic-Adar downweight, exact integers: a 1-part order forms
        // no pair, so dg ≥ 2 and ln(dg) > 0 on every row
        .withColumn("w",
          floor(lit(1e9) / log($"dg".cast("double")) + lit(0.5)).cast("long"))
        .groupBy($"a", $"b", $"da", $"db")
        .agg(count(lit(1)).as("n_common"), sum($"w").as("score_q")))
  }

  /** The DISTINCT canonical simple-edge set (a < b) of the co-purchase
    * graph — derived from [[coCounts]] by a projection (one row per pair already): k-core,
    * modularity, and assortativity all start from it, and each was
    * paying its own distinct pass over the multi-edge enumeration.
    */
  private[ops] def coEdges(s: SparkSession, d: String): DataFrame =
    graft.core.IndexCache(s, s"co-edges|$d",
      // one row per pair by construction — no distinct pass needed
      coCounts(s, d).select("a", "b"))

  private val graphAdamicAdar = Q(
    "graph_adamic_adar",
    (s, d) => {
      import s.implicits._
      // the score sum is pre-aggregated in the shared statistics
      // artifact; the query is a scan-linear projection + top-20
      coCounts(s, d)
        .select($"a".as("pa"), $"b".as("pb"), $"n_common",
          dround($"score_q".cast("double") / 1e9, 6).as("aa_score"))
        .orderBy($"aa_score".desc, $"pa".asc, $"pb".asc)
        .limit(20)
    },
    Some("WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
      "FROM lineitem), " +
      "deg AS (SELECT o, count(*) AS dg FROM li GROUP BY 1 HAVING count(*) >= 2), " +
      "w AS (SELECT li.o, li.p, " +
      "CAST(floor(1e9 / ln(CAST(dg AS DOUBLE)) + 0.5) AS BIGINT) AS w " +
      "FROM li JOIN deg USING (o)), " +
      "pairs AS (SELECT a.p AS pa, b.p AS pb, count(*) AS n_common, " +
      "SUM(a.w) AS score_q FROM w a JOIN w b ON a.o = b.o AND a.p < b.p " +
      "GROUP BY 1,2) " +
      "SELECT pa, pb, n_common, " +
      OSql.sround("CAST(score_q AS DOUBLE) / 1e9", 6) + " AS aa_score " +
      "FROM pairs ORDER BY aa_score DESC, pa, pb LIMIT 20"))

  // ------------------------------------------------------------------
  // graph_jaccard_neighbors — neighborhood-Jaccard link prediction over
  // the same part ↔ order bipartite graph: score(a, b) =
  // |N(a) ∩ N(b)| / |N(a) ∪ N(b)| with N(p) = the distinct orders
  // containing part p. The third classic common-neighbor score next to
  // raw counts (co-pairs) and Adamic-Adar downweighting — Jaccard
  // NORMALIZES by both degrees, so a pair of niche parts that always
  // co-occur outranks two bestsellers that overlap incidentally. The
  // intersection count reads off the shared within-order pair artifact
  // ([[coCounts]] — candidate pairs are only ever enumerated within a
  // basket, Σ|basket|², never all parts²); degrees are one extra
  // distinct-scan + count agg, linear. The union size is computed as
  // da + db − i from three exact longs — no second pair pass. Top-20
  // on (jaccard desc, pa, pb) — fully tie-broken.
  // ------------------------------------------------------------------

  private val graphJaccardNeighbors = Q(
    "graph_jaccard_neighbors",
    (s, d) => {
      import s.implicits._
      // intersection counts and both degrees come pre-aggregated from
      // the shared statistics artifact (see [[coCounts]] — the
      // Σ|basket|² enumeration is paid once at staging); the union
      // size is da + db − i from three exact longs, and the query is
      // a scan-linear projection + top-20
      coCounts(s, d)
        .select($"a".as("pa"), $"b".as("pb"), $"n_common",
          dround($"n_common".cast("double") / ($"da" + $"db" - $"n_common"), 6)
            .as("nbr_jaccard"))
        .orderBy($"nbr_jaccard".desc, $"pa".asc, $"pb".asc)
        .limit(20)
    },
    Some("WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
      "FROM lineitem), " +
      "deg AS (SELECT p, count(*) AS dp FROM li GROUP BY 1), " +
      "pairs AS (SELECT a.p AS pa, b.p AS pb, count(*) AS n_common " +
      "FROM li a JOIN li b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2) " +
      "SELECT pa, pb, n_common, " +
      OSql.sround("CAST(n_common AS DOUBLE) / (da.dp + db.dp - n_common)", 6) +
      " AS nbr_jaccard FROM pairs " +
      "JOIN deg da ON da.p = pa JOIN deg db ON db.p = pb " +
      "ORDER BY nbr_jaccard DESC, pa, pb LIMIT 20"))

  // ------------------------------------------------------------------
  // seq_pattern_regex — MATCH_RECOGNIZE-style behavior detection: each
  // user's event stream, time-ordered, becomes a string of type
  // initials (c/e/p/s/v) and the funnel pattern s[cv]*p (signup, any
  // browsing, purchase — contiguous) is counted per user with
  // non-overlapping leftmost matches (Java regex and DuckDB RE2 agree
  // on this grammar). The string builds through sort_array over
  // (ms, event_id) structs — deterministic total order — and the
  // output is the match-count histogram.
  // ------------------------------------------------------------------

  private val seqPatternRegex = Q(
    "seq_pattern_regex",
    (s, d) => {
      import s.implicits._
      val seqs = Tables.events(s, d)
        .select($"user_id", struct($"ms", $"event_id",
          substring($"event_type", 1, 1).as("i")).as("e"))
        .groupBy("user_id").agg(collect_list($"e").as("es"))
        .select($"user_id",
          expr("array_join(transform(array_sort(es), x -> x.i), '')").as("str"))
      seqs
        .select($"user_id",
          size(regexp_extract_all($"str", lit("s[cv]*p"), lit(0)))
            .cast("long").as("matches"))
        .groupBy("matches").agg(count(lit(1)).as("n_users"))
        .orderBy("matches")
    },
    Some("WITH seqs AS (SELECT user_id, " +
      "string_agg(substr(event_type, 1, 1), '' " +
      "ORDER BY epoch_ms(ts), event_id) AS str FROM events GROUP BY 1), " +
      "m AS (SELECT user_id, CAST(len(regexp_extract_all(str, 's[cv]*p')) " +
      "AS BIGINT) AS matches FROM seqs) " +
      "SELECT matches, count(*) AS n_users FROM m GROUP BY 1 ORDER BY 1"))

  // ------------------------------------------------------------------
  // sample_negative — deterministic negative sampling (the recsys /
  // contrastive-training prep step): each user is assigned up to 2
  // item buckets (props.k mod 50 — a domain sparse enough that every
  // user genuinely misses some) they have NEVER interacted with,
  // picked by md5(user:bucket) order — stable under re-runs,
  // repartitioning, and incremental ingest, unlike rand().
  //
  // Round 11 re-plan (sf0.1→sf1 measured 33×): the old shape
  // materialized the users × buckets candidate grid and anti-joined
  // the seen set with a BROADCAST build that grew with N — the exact
  // failure the plan linter hunts. Now the bucket DOMAIN (≤50 values)
  // broadcasts as a single collected array and everything per-user is
  // one map-side projection: array_except(domain, seen-set) → struct
  // sort by the md5 pick key → slice 2 → explode ≤2 rows. One shuffle
  // builds the per-user seen sets (map-side partial collect_set), one
  // |buckets|-row rollup ends it; no grid, no anti join, no window.
  // Null-bucket events (props without k) carry no bucket in either
  // engine. Output: per-bucket assignment ledger with an exact
  // user-id checksum.
  // ------------------------------------------------------------------

  private val sampleNegative = Q(
    "sample_negative",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id",
          (get_json_object($"props", "$.k").cast("long") % 50).as("kb"))
        .filter($"kb".isNotNull)
      val seen = ev.groupBy($"user_id").agg(collect_set($"kb").as("seen"))
      val allB = ev.agg(collect_set($"kb").as("all_kb"))
      seen.crossJoin(broadcast(allB))
        .select($"user_id", explode(expr(
          "slice(array_sort(transform(array_except(all_kb, seen), " +
            "b -> struct(md5(concat(cast(user_id as string), ':', " +
            "cast(b as string))) as o, b as b))), 1, 2)")).as("p"))
        .groupBy($"p.b".as("kb")).agg(
          count(lit(1)).as("n_users"),
          sum($"user_id").as("user_id_sum"))
        .orderBy("kb")
    },
    // TRY_CAST + post-cast null filter: the EXACT predicate the Spark
    // side applies (cast-then-filter), so a non-numeric props.k drops
    // identically in both engines instead of erroring DuckDB's strict
    // CAST or diverging on placement of the null filter
    Some("WITH basket AS (SELECT DISTINCT user_id, kb FROM " +
      "(SELECT user_id, TRY_CAST(props->>'$.k' AS BIGINT) % 50 AS kb " +
      "FROM events) WHERE kb IS NOT NULL), " +
      "cand AS (SELECT u.user_id, t.kb FROM " +
      "(SELECT DISTINCT user_id FROM basket) u CROSS JOIN " +
      "(SELECT DISTINCT kb FROM basket) t), " +
      "unseen AS (SELECT c.user_id, c.kb FROM cand c " +
      "LEFT JOIN basket b ON b.user_id = c.user_id " +
      "AND b.kb = c.kb WHERE b.user_id IS NULL), " +
      "r AS (SELECT user_id, kb, row_number() OVER " +
      "(PARTITION BY user_id ORDER BY " +
      "md5(CAST(user_id AS VARCHAR) || ':' || CAST(kb AS VARCHAR)), kb) AS rn " +
      "FROM unseen) " +
      "SELECT kb, count(*) AS n_users, " +
      "CAST(SUM(user_id) AS BIGINT) AS user_id_sum " +
      "FROM r WHERE rn <= 2 GROUP BY 1 ORDER BY 1"))

  // ------------------------------------------------------------------
  // sim_maxsim_labels — LATE-INTERACTION similarity between label
  // groups (the ColBERT MaxSim shape): for probe group A scored
  // against corpus group B, MaxSim(A→B) = mean over probe vectors i
  // of max over j∈B of sim(i, j) — each probe token keeps its own
  // best corpus match instead of collapsing both sides to centroids.
  //
  // Probe side = a FIXED-size shortlist: the 32 lowest vec_ids per
  // probe label {0, 1} — deterministic, restated verbatim in the
  // oracle. Production late interaction always scores a bounded
  // shortlist; a probe side proportional to the corpus (all label-0/1
  // vectors — the round-8 grade) makes the broadcast grow with N and
  // the compute O(N²). The shortlist pick is a rank filter Catalyst
  // lowers to partial+final WindowGroupLimit, so ≤32 rows per label
  // survive map-side; the broadcast is then ≤64 rows at ANY corpus
  // size. Sims are the same 6dp-rounded dot_f folds as the exact-ANN
  // family; each per-probe max quantizes to an exact 10⁶ integer
  // before the group mean, so the reduction is order-independent. One
  // corpus scan joins the bounded broadcast probe table; maxes
  // collapse per (probe vec, corpus label) map-side.
  // ------------------------------------------------------------------

  private val simMaxsimLabels = Q(
    "sim_maxsim_labels",
    (s, d) => {
      import s.implicits._
      val emb = Tables.t(s, d, "embeddings")
      val wp = Window.partitionBy($"label").orderBy($"vec_id".asc)
      val probes = emb.filter($"label".isin(0, 1))
        .withColumn("prn", row_number().over(wp))
        .filter($"prn" <= 32)
        .select($"vec_id".as("pid"), $"label".as("la"), $"embedding".as("pv"))
      val sims = emb.filter($"label" >= 2)
        .crossJoin(broadcast(probes))
        .select($"pid", $"la", $"label".as("lb"),
          Det.dround(graft.functions.VectorExpressions.dotF(s, $"embedding", $"pv"), 6)
            .as("sim"))
      val best = sims.groupBy("pid", "la", "lb").agg(max($"sim").as("mx"))
        .withColumn("q", floor($"mx" * lit(1e6) + lit(0.5)).cast("long"))
      best.groupBy("la", "lb").agg(
          count(lit(1)).as("n_probe"),
          dround(sum($"q").cast("double") / count(lit(1)) / 1e6, 6).as("maxsim"))
        .orderBy("la", "lb")
    },
    Some("WITH probes AS (SELECT pid, la, pv FROM " +
      "(SELECT vec_id AS pid, label AS la, embedding AS pv, " +
      "row_number() OVER (PARTITION BY label ORDER BY vec_id) AS prn " +
      "FROM embeddings WHERE label IN (0, 1)) WHERE prn <= 32), " +
      "sims AS (SELECT p.pid, p.la, e.label AS lb, " +
      OSql.sround("list_dot_product(e.embedding, p.pv)", 6) + " AS sim " +
      "FROM embeddings e CROSS JOIN probes p WHERE e.label >= 2), " +
      "best AS (SELECT pid, la, lb, " +
      "CAST(floor(max(sim) * 1e6 + 0.5) AS BIGINT) AS q " +
      "FROM sims GROUP BY 1,2,3) " +
      "SELECT la, lb, count(*) AS n_probe, " +
      OSql.sround("CAST(SUM(q) AS DOUBLE) / count(*) / 1e6", 6) + " AS maxsim " +
      "FROM best GROUP BY 1,2 ORDER BY 1,2"))

  // ------------------------------------------------------------------
  // graph_kcore_peel — k-core peeling (k = 2) over the part
  // co-purchase graph TO FIXPOINT: repeatedly drop nodes with degree
  // < 2 and the edges they carry until the edge set stops changing —
  // the standard dense-subgraph extraction; the stable set IS the
  // 2-core. Each round is one degree aggregate + one semi-join filter
  // per endpoint (the same co-partitioned superstep shape as the
  // other iterative graph keys), on a Mat'd edge state (the
  // loop-until-stable discipline of dedup_cluster's cap-then-contract
  // fallback); peeling only removes edges, so an unchanged COUNT
  // proves an unchanged SET and one cheap count() per round is the
  // whole convergence test. Output is one row — (rounds to
  // stability, 2-core nodes, 2-core edges); a graph still shrinking
  // after the 64-round safety cap reports the sentinel (65, 0, 0),
  // mirrored exactly by the oracle's capped recursion (a peel needs
  // >64 rounds only on ~130-node-long induced paths — not a
  // co-purchase shape). Edges come from the shared co-purchase pair
  // statistics build ([[coCounts]]) — bounded baskets, never a cross join.
  //
  // The oracle replays the loop as a RECURSIVE CTE whose working
  // table is the surviving edge set (DuckDB permits the degree
  // aggregate over the previous iteration inside the recursive term);
  // the two appended zero rounds make "the set died at round r" and
  // "the set stabilized nonempty" both detectable as the first
  // equal-count consecutive pair.
  // ------------------------------------------------------------------

  private val graphKcorePeel = Q(
    "graph_kcore_peel",
    (s, d) => {
      import s.implicits._
      // the materialized state is the CANONICAL (a < b) edge list —
      // half the rows of the symmetric form; degree reads both
      // endpoint columns, so nothing is lost
      var edges = coEdges(s, d)
      var edgeCnt = edges.count()
      var stableAt = if (edgeCnt == 0) 0 else -1
      var r = 0
      while (stableAt < 0 && r < 64) {
        val deg = edges.select($"a".as("n"))
          .unionByName(edges.select($"b".as("n")))
          .groupBy("n").agg(count(lit(1)).as("dg"))
        val keep = deg.filter($"dg" >= 2).select("n")
        val next = graft.core.Mat(s, edges
          .join(keep.select($"n".as("a")), Seq("a"), "left_semi")
          .join(keep.select($"n".as("b")), Seq("b"), "left_semi")
          .select("a", "b"), s"kcore-r$r")
        val c = next.count()
        if (c == edgeCnt) stableAt = r
        else { edges = next; edgeCnt = c; r += 1 }
      }
      if (stableAt < 0)
        Seq((65L, 0L, 0L)).toDF("n_rounds", "n_core_nodes", "n_core_edges")
      else
        edges.select(explode(array($"a", $"b")).as("n"))
          .agg(coalesce(countDistinct($"n"), lit(0L)).as("n_core_nodes"),
            count(lit(1)).as("n_core_edges"))
          .select(lit(stableAt.toLong).as("n_rounds"),
            $"n_core_nodes", ($"n_core_edges" / 2).cast("long").as("n_core_edges"))
    },
    Some("WITH RECURSIVE " +
      "li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), " +
      "pr AS (SELECT DISTINCT a.p AS a, b.p AS b FROM li a " +
      "JOIN li b ON a.o = b.o AND a.p < b.p), " +
      "sym AS (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr), " +
      "peel(round, a, b) AS (" +
      "SELECT 0, a, b FROM sym " +
      "UNION ALL " +
      "SELECT p.round + 1, p.a, p.b FROM peel p " +
      "JOIN (SELECT a AS n FROM peel GROUP BY 1 HAVING count(*) >= 2) ka " +
      "ON ka.n = p.a " +
      "JOIN (SELECT a AS n FROM peel GROUP BY 1 HAVING count(*) >= 2) kb " +
      "ON kb.n = p.b " +
      "WHERE p.round < 64), " +
      "led AS (SELECT round, count(DISTINCT a) AS nodes, count(*) // 2 AS edges " +
      "FROM peel GROUP BY 1), " +
      "led2 AS (SELECT round, nodes, edges FROM led " +
      "UNION ALL SELECT coalesce(max(round) + 1, 0), 0, 0 FROM led " +
      "UNION ALL SELECT coalesce(max(round) + 2, 1), 0, 0 FROM led), " +
      "stab AS (SELECT min(l1.round) AS r FROM led2 l1 " +
      "JOIN led2 l2 ON l2.round = l1.round + 1 AND l2.edges = l1.edges) " +
      "SELECT CAST(stab.r AS BIGINT) AS n_rounds, " +
      "CAST(coalesce(led2.nodes, 0) AS BIGINT) AS n_core_nodes, " +
      "CAST(coalesce(led2.edges, 0) AS BIGINT) AS n_core_edges " +
      "FROM stab LEFT JOIN led2 ON led2.round = stab.r"))

  // ------------------------------------------------------------------
  // dedup_fuzzy_levenshtein — EDIT-DISTANCE fuzzy matching with
  // blocking, the entity-resolution primitive for typo'd/variant
  // records that token-set methods miss (one edit changes few grams
  // but Jaccard needs shingle overlap): part names pair within their
  // (brand, |Δlen| ≤ 2) band, and pairs at distance ≤ 3 count as
  // fuzzy duplicates. Both engines implement classic Levenshtein
  // identically. Output: the per-brand resolution ledger.
  //
  // Scale shape (the round-12 verdict's quadratic-law fix): the
  // ledger NEVER enumerates row pairs. Three sub-quadratic parts:
  //  1. n_candidates — pure ARITHMETIC off the (brand, len) count
  //    ledger: Σ_l C(n_l,2) + Σ_{l<l'≤l+2} n_l·n_l' — identical to the
  //    oracle's banded row-pair count with zero enumeration (the
  //    ledger is ≤ |brands|×|lens| rows at any corpus size).
  //  2. Same-name pairs (the duplicate-clique quadratic that blew up
  //    sf1: m copies = m²/2 row pairs) — collapsed to multiplicity
  //    arithmetic C(m,2) per DISTINCT (brand, name) group; they are
  //    dist-0, so they feed both n_exact and n_fuzzy without one
  //    comparison.
  //  3. DISTINCT-name pairs — enumerated through a LOSSLESS
  //    PassJoin-style segment filter ([[fuzzyDistinctPairs]]): ed ≤ 3
  //    means one of a name's d+1 = 4 even partition segments survives
  //    untouched and appears verbatim in the partner within a ±3
  //    shift, so (brand, partner-len, segment-index, segment-string)
  //    is an EQUI-JOIN key over the distinct-name vocabulary —
  //    candidates are segment-bucket co-occurrences, never a block
  //    cross; surviving pairs pay one levenshtein each and fan back
  //    to row counts as m_a·m_b. Work scales with the VOCABULARY, not
  //    the corpus — a duplicate-rich 100 TB archive enumerates the
  //    same distinct pairs as its deduplicated vocabulary would.
  // Pinned by EdgeCaseSpec doubling laws (length-disjoint copies
  // double the ledger; SAME-length copies quadruple the ledger while
  // the enumerated distinct-pair set is UNCHANGED) + a plan law on
  // the segment join keys.
  // ------------------------------------------------------------------

  /** The enumerated DISTINCT-name candidate pairs (p_brand, na < nb)
    * of the fuzzy join — the PassJoin segment filter described on the
    * key. Lossless for ed ≤ 3 within the |Δlen| ≤ 2 band: any pair
    * with an untouched segment meets the (brand, len, i, seg) key in
    * the orientation where the ≥4-char side is partitioned; both-short
    * (≤3 chars) names pair directly in a bounded side block. Exposed
    * for the EdgeCaseSpec law that duplicate copies do not grow this
    * set.
    */
  private[graft] def fuzzyDistinctPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.t(s, d, "part")
      .groupBy($"p_brand", $"p_name").agg(count(lit(1)).as("m"))
      .select($"p_brand", $"p_name", length($"p_name").as("len"))
    // index side: the 4 even partition segments of every ≥4-char name
    val seg = g.filter($"len" >= 4)
      .select($"p_brand", $"p_name".as("ns"), $"len".as("ls"),
        explode(sequence(lit(0), lit(3))).as("i"))
      .withColumn("st", expr("(i * ls) div 4 + 1"))
      .withColumn("sl", expr("((i + 1) * ls) div 4 - (i * ls) div 4"))
      .withColumn("seg", expr("substring(ns, cast(st as int), cast(sl as int))"))
      .select($"p_brand", $"ns", $"ls", $"i", $"st", $"sl", $"seg")
    // probe side: every name emits, for each in-band partner length
    // and segment index, the substrings inside the ±3 shift window
    val probe = g
      .select($"p_brand", $"p_name".as("nr"), $"len".as("lr"),
        explode(sequence($"len" - 2, $"len" + 2)).as("ls"))
      .filter($"ls" >= 4)
      .select($"p_brand", $"nr", $"lr", $"ls",
        explode(sequence(lit(0), lit(3))).as("i"))
      .withColumn("st", expr("(i * ls) div 4 + 1"))
      .withColumn("sl", expr("((i + 1) * ls) div 4 - (i * ls) div 4"))
      .withColumn("lo", greatest($"st" - 3, lit(1)))
      .withColumn("hi", least($"st" + 3, $"lr" - $"sl" + 1))
      .filter($"lo" <= $"hi")
      .select($"p_brand", $"nr", $"ls", $"i", $"sl",
        explode(sequence($"lo", $"hi")).as("pp"))
      .withColumn("seg", expr("substring(nr, cast(pp as int), cast(sl as int))"))
      .select($"p_brand", $"nr", $"ls", $"i", $"seg")
    val long4 = probe.join(seg.select($"p_brand", $"ns", $"ls", $"i", $"seg"),
        Seq("p_brand", "ls", "i", "seg"))
      .filter($"nr" =!= $"ns")
      .select($"p_brand",
        least($"nr", $"ns").as("na"), greatest($"nr", $"ns").as("nb"))
    // both-short pairs (the segment lemma needs 4 non-empty segments):
    // a bounded vocabulary block — names of ≤3 chars
    val sh = g.filter($"len" <= 3)
    val short3 = sh.select($"p_brand", $"p_name".as("na"), $"len".as("la"))
      .join(sh.select($"p_brand", $"p_name".as("nb"), $"len".as("lb")),
        Seq("p_brand"))
      .filter($"na" < $"nb" && abs($"la" - $"lb") <= 2)
      .select($"p_brand", $"na", $"nb")
    long4.union(short3).distinct()
  }

  private val dedupFuzzyLevenshtein = Q(
    "dedup_fuzzy_levenshtein",
    (s, d) => {
      import s.implicits._
      val g = Tables.t(s, d, "part")
        .groupBy($"p_brand", $"p_name").agg(count(lit(1)).as("m"))
        .withColumn("len", length($"p_name"))
      // 1. banded row-pair count: arithmetic off the length ledger
      val ll = g.groupBy($"p_brand", $"len").agg(sum($"m").as("nl"))
      val nc = ll.select($"p_brand", $"len".as("la"), $"nl".as("nla"))
        .join(ll.select($"p_brand", $"len".as("lb"), $"nl".as("nlb")),
          Seq("p_brand"))
        .filter($"lb" - $"la" >= 0 && $"lb" - $"la" <= 2)
        .select($"p_brand",
          when($"la" === $"lb", expr("(nla * (nla - 1)) div 2"))
            .otherwise($"nla" * $"nlb").as("pairs"))
        .groupBy("p_brand").agg(sum($"pairs").as("n_candidates"))
        .filter($"n_candidates" > 0)
      // 2. same-name row pairs: C(m,2) per distinct-name group
      val ex = g.groupBy($"p_brand")
        .agg(sum(expr("(m * (m - 1)) div 2")).as("n_same"))
      // 3. distinct-name pairs: segment-filtered enumeration, one
      // levenshtein per surviving DISTINCT pair, row counts by m_a·m_b
      val mm = g.select($"p_brand", $"p_name", $"m")
      val fz = fuzzyDistinctPairs(s, d)
        .withColumn("dist", levenshtein($"na", $"nb"))
        .filter($"dist" <= 3)
        .join(mm.select($"p_brand", $"p_name".as("na"), $"m".as("ma")),
          Seq("p_brand", "na"))
        .join(mm.select($"p_brand", $"p_name".as("nb"), $"m".as("mb")),
          Seq("p_brand", "nb"))
        .groupBy("p_brand").agg(sum($"ma" * $"mb").as("n_cross"))
      nc.join(ex, Seq("p_brand"), "left_outer")
        .join(fz, Seq("p_brand"), "left_outer")
        .select($"p_brand", $"n_candidates",
          (coalesce($"n_cross", lit(0L)) + coalesce($"n_same", lit(0L)))
            .as("n_fuzzy_pairs"),
          coalesce($"n_same", lit(0L)).as("n_exact_pairs"))
        .orderBy("p_brand")
    },
    Some("WITH p AS (SELECT p_brand, p_partkey, p_name, " +
      "length(p_name) AS len FROM part), " +
      "cand AS (SELECT a.p_brand, " +
      "levenshtein(a.p_name, b.p_name) AS dist " +
      "FROM p a JOIN p b ON a.p_brand = b.p_brand " +
      "AND a.p_partkey < b.p_partkey AND abs(a.len - b.len) <= 2) " +
      "SELECT p_brand, count(*) AS n_candidates, " +
      "CAST(SUM(CASE WHEN dist <= 3 THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_fuzzy_pairs, " +
      "CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_exact_pairs " +
      "FROM cand GROUP BY 1 ORDER BY 1"))

  // ------------------------------------------------------------------
  // graph_modularity — Newman modularity Q of the brand partition over
  // the co-purchase graph: do parts of the same brand form cohesive
  // communities, or do baskets mix brands freely? The partition-QUALITY
  // number next to the family's link scores (jaccard/adamic-adar) and
  // community assignments (components, label propagation): Q =
  // Σ_c [e_c/m − (d_c/2m)²] over brands c, where e_c counts within-
  // brand edges, d_c sums member degrees, on the SIMPLE (distinct)
  // within-order pair graph. Edges read off the shared [[coCounts]]
  // artifact (never all parts²); degrees are one endpoint-union agg;
  // every count is an exact long, the per-brand term is ONE double
  // expression quantized at 10⁹ before the ≤|brands|-row sum (order-
  // independent), and the brand table (25 rows) broadcasts. Parts with
  // no co-purchase edge have degree 0 and contribute nothing — brands
  // appear with their edge-incident member count.
  // ------------------------------------------------------------------

  private val graphModularity = Q(
    "graph_modularity",
    (s, d) => {
      import s.implicits._
      val e = coEdges(s, d)
      val br = Tables.t(s, d, "part")
        .select($"p_partkey".as("p"), $"p_brand".as("brand"))
      val deg = e.select($"a".as("p"))
        .unionAll(e.select($"b".as("p")))
        .groupBy("p").agg(count(lit(1)).as("dg"))
      // the part->brand map is SF-scaled: hint-free joins (plan-linter
      // R5) — AQE broadcasts the map while it is small and graduates to
      // shuffle joins keyed on the part id at scale
      val bd = deg.join(br, "p")
        .groupBy("brand")
        .agg(count(lit(1)).as("n_parts"), sum($"dg").as("dc"))
      val ew = e
        .join(br.select($"p".as("a"), $"brand".as("ba")), "a")
        .join(br.select($"p".as("b"), $"brand".as("bb")), "b")
        .filter($"ba" === $"bb")
        .groupBy($"ba".as("brand")).agg(count(lit(1)).as("ec"))
      val grand = e.agg(count(lit(1)).cast("double").as("m"))
      val terms = bd.join(ew, Seq("brand"), "left_outer")
        .select($"brand", $"n_parts", $"dc",
          coalesce($"ec", lit(0L)).as("e_within"))
        .crossJoin(broadcast(grand))
        .withColumn("tq",
          floor((lit(4.0) * $"m" * $"e_within"
            - $"dc".cast("double") * $"dc")
            / (lit(4.0) * $"m" * $"m") * 1e9 + 0.5).cast("long"))
      val q = terms.agg((sum($"tq").cast("double") / 1e9).as("qmod"))
      terms.crossJoin(broadcast(q))
        .select($"brand", $"n_parts", $"dc".cast("long").as("degree_sum"),
          $"e_within", dround($"qmod", 6).as("modularity"))
        .orderBy("brand")
    },
    Some("WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
      "FROM lineitem), " +
      "e AS (SELECT DISTINCT a.p AS a, b.p AS b FROM li a " +
      "JOIN li b ON a.o = b.o AND a.p < b.p), " +
      "br AS (SELECT p_partkey AS p, p_brand AS brand FROM part), " +
      "deg AS (SELECT p, CAST(count(*) AS BIGINT) AS dg FROM " +
      "(SELECT a AS p FROM e UNION ALL SELECT b AS p FROM e) GROUP BY 1), " +
      "bd AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_parts, " +
      "CAST(SUM(dg) AS BIGINT) AS dc FROM deg JOIN br USING (p) GROUP BY 1), " +
      "ew AS (SELECT ba.brand AS brand, CAST(count(*) AS BIGINT) AS ec " +
      "FROM e JOIN br ba ON ba.p = e.a JOIN br bb ON bb.p = e.b " +
      "WHERE ba.brand = bb.brand GROUP BY 1), " +
      "g AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM e), " +
      "terms AS (SELECT brand, n_parts, dc, COALESCE(ec, 0) AS e_within, " +
      "CAST(floor((4.0 * m * COALESCE(ec, 0) - CAST(dc AS DOUBLE) * dc) " +
      "/ (4.0 * m * m) * 1e9 + 0.5) AS BIGINT) AS tq " +
      "FROM bd LEFT JOIN ew USING (brand) CROSS JOIN g), " +
      "q AS (SELECT CAST(SUM(tq) AS DOUBLE) / 1e9 AS qmod FROM terms) " +
      "SELECT brand, n_parts, dc AS degree_sum, e_within, " +
      OSql.sround("qmod", 6) + " AS modularity " +
      "FROM terms CROSS JOIN q ORDER BY brand"))

  // ------------------------------------------------------------------
  // graph_assortativity — Newman's degree assortativity coefficient r
  // over the simple co-purchase graph: the Pearson correlation of
  // endpoint degrees across edges (do hubs link to hubs, r > 0, or to
  // leaves, r < 0?) — the one-number mixing diagnostic next to
  // `graph_modularity`'s partition quality and `graph_degree_stats`'
  // marginals. Edges are the DISTINCT canonical pairs off the shared
  // co-pairs artifact; degrees are one endpoint-union agg (node degree
  // in the simple graph), broadcast back onto the directed edge list
  // (each edge counted in both orientations, the standard spelling
  // that makes x and y exchangeable: Σx = Σy, Σx² = Σy²). All five
  // moments are exact BIGINT sums of bounded products (deg ≤ |parts|);
  // r = (n·Σxy − (Σx)²)/(n·Σx² − (Σx)²) is ONE double formula with
  // identical text, each factor cast to double BEFORE multiplying
  // (n·Σxy overflows i64 at archive scale); a zero denominator — a
  // regular graph — emits NULL, never 0/0. At 100 TB the degree table
  // outgrows a broadcast: both sides bucket by node instead (the
  // join_bucketed co-location pattern); nothing else changes.
  // ------------------------------------------------------------------

  private val graphAssortativity = Q(
    "graph_assortativity",
    (s, d) => {
      import s.implicits._
      val edges = coEdges(s, d)
      val deg = edges.select($"a".as("n")).unionByName(
          edges.select($"b".as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val directed = edges.select($"a".as("x"), $"b".as("y"))
        .unionByName(edges.select($"b".as("x"), $"a".as("y")))
      val m = directed
        .join(broadcast(deg.select($"n".as("x"), $"dg".as("dx"))), "x")
        .join(broadcast(deg.select($"n".as("y"), $"dg".as("dy"))), "y")
        .agg(count(lit(1)).as("n"),
          sum($"dx").as("sx"),
          sum($"dx" * $"dx").as("sxx"),
          sum($"dx" * $"dy").as("sxy"))
      val nodes = deg.agg(count(lit(1)).as("n_nodes"))
      nodes.crossJoin(m)
        .select($"n_nodes",
          ($"n" / 2).cast("long").as("n_edges"),
          when($"n".cast("double") * $"sxx" -
              $"sx".cast("double") * $"sx" =!= 0.0,
            dround(($"n".cast("double") * $"sxy"
              - $"sx".cast("double") * $"sx")
              / ($"n".cast("double") * $"sxx"
                - $"sx".cast("double") * $"sx"), 6)).as("assortativity"))
    },
    Some("WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
      "FROM lineitem), " +
      "e AS (SELECT DISTINCT a.p AS a, b.p AS b FROM li a " +
      "JOIN li b ON a.o = b.o AND a.p < b.p), " +
      "dir AS (SELECT a AS x, b AS y FROM e " +
      "UNION ALL SELECT b AS x, a AS y FROM e), " +
      "deg AS (SELECT x AS n, count(*) AS dg FROM dir GROUP BY 1), " +
      "j AS (SELECT dx.dg AS dx, dy.dg AS dy FROM dir " +
      "JOIN deg dx ON dx.n = dir.x JOIN deg dy ON dy.n = dir.y), " +
      "mo AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
      "CAST(SUM(dx) AS BIGINT) AS sx, " +
      "CAST(SUM(dx * dx) AS BIGINT) AS sxx, " +
      "CAST(SUM(dx * dy) AS BIGINT) AS sxy FROM j), " +
      "nn AS (SELECT count(*) AS n_nodes FROM deg) " +
      "SELECT n_nodes, CAST(n / 2 AS BIGINT) AS n_edges, " +
      "CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx <> 0 THEN " +
      OSql.sround("(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx) / " +
        "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)", 6) +
      " END AS assortativity FROM nn CROSS JOIN mo"))

  // ------------------------------------------------------------------
  // graph_local_clustering — the LOCAL clustering-coefficient ledger
  // of the co-purchase graph: `graph_triangle_count` reports global
  // TRANSITIVITY (3·Δ/wedges, one number a few hub stars dominate);
  // the average LOCAL coefficient weights every node equally and is
  // the standard small-world statistic next to it. Triangles are
  // enumerated ONCE at the orientation-minimum vertex (the
  // Suri–Vassilvitskii discipline: out-degree bounded by arboricity,
  // wedge volume Σd_out², never the raw Σd² hub blow-up), then each
  // triangle credits its THREE vertices via one explode +
  // partial+final count. Per-node coefficients quantize to BIGINT
  // (2·Δ_v·10⁶ div dg(dg−1) — all non-negative, trunc = floor) BEFORE
  // the global sum, so the reduction is order-independent; degree-1
  // nodes are excluded (coefficient undefined), triangle-free nodes
  // count as exact zeros. Edges come from the shared [[coEdges]]
  // artifact — the family's one enumeration pass.
  // ------------------------------------------------------------------

  private val graphLocalClustering = Q(
    "graph_local_clustering",
    (s, d) => {
      import s.implicits._
      val e = coEdges(s, d) // canonical a < b, distinct
      val sym = e.select($"a".as("n"), $"b".as("m"))
        .unionByName(e.select($"b".as("n"), $"a".as("m")))
      // node-bounded degree ledger, checkpointed: three join branches
      // (both orientation sides + the coefficient join) each re-ran
      // the 2×-edge union + count when left lazy (r16, guide §2.4)
      val deg = sym.groupBy($"n").agg(count(lit(1)).as("dg"))
        .localCheckpoint(true)
      val withDeg = e
        .join(deg.select($"n".as("a"), $"dg".as("da")), "a")
        .join(deg.select($"n".as("b"), $"dg".as("db")), "b")
      val oriented = graft.core.Mat(s, withDeg.select(
          when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"),
            struct($"a".as("s"), $"b".as("t")))
            .otherwise(struct($"b".as("s"), $"a".as("t"))).as("e"))
        .select($"e.s".as("s"), $"e.t".as("t")), "lcc-oriented")
      val wedges = oriented.select($"s", $"t".as("t1"))
        .join(oriented.select($"s", $"t".as("t2")), Seq("s"))
        .filter($"t1" < $"t2")
      // INNER join (not semi): the closed wedge IS the triangle row,
      // and all three vertex ids ride it to the per-node credit
      val tri = wedges.join(e,
        wedges("t1") === e("a") && wedges("t2") === e("b"))
        .select($"s", $"t1", $"t2")
      val tv = tri.select(explode(array($"s", $"t1", $"t2")).as("v"))
        .groupBy($"v").agg(count(lit(1)).as("t"))
      val cc = deg.filter($"dg" >= 2)
        .join(tv, deg("n") === tv("v"), "left")
        .select($"n",
          expr("(2 * coalesce(t, 0) * 1000000) div (dg * (dg - 1))")
            .cast("long").as("q"))
      cc.agg(count(lit(1)).as("n_nodes"),
          sum(($"q" === 1000000L).cast("long")).as("n_perfect"),
          dround(sum($"q").cast("double") /
            (count(lit(1)).cast("double") * 1e6), 6).as("avg_local_cc"))
    },
    Some("WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
      "FROM lineitem), " +
      "pr AS (SELECT DISTINCT a.p AS a, b.p AS b FROM li a " +
      "JOIN li b ON a.o = b.o AND a.p < b.p), " +
      "sym AS (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr), " +
      "deg AS (SELECT a AS n, CAST(count(*) AS BIGINT) AS dg " +
      "FROM sym GROUP BY 1), " +
      "ori AS (SELECT CASE WHEN da < db OR (da = db AND a < b) " +
      "THEN a ELSE b END AS s, " +
      "CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS t " +
      "FROM (SELECT pr.a, pr.b, d1.dg AS da, d2.dg AS db FROM pr " +
      "JOIN deg d1 ON d1.n = pr.a JOIN deg d2 ON d2.n = pr.b)), " +
      "w AS (SELECT e1.s, e1.t AS t1, e2.t AS t2 FROM ori e1 " +
      "JOIN ori e2 ON e1.s = e2.s AND e1.t < e2.t), " +
      "tri AS (SELECT w.s, w.t1, w.t2 FROM w " +
      "JOIN pr ON pr.a = w.t1 AND pr.b = w.t2), " +
      "tv AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM " +
      "(SELECT s AS v FROM tri UNION ALL SELECT t1 FROM tri " +
      "UNION ALL SELECT t2 FROM tri) GROUP BY 1), " +
      "cc AS (SELECT deg.n, " +
      "(2 * COALESCE(tv.t, 0) * 1000000) // (deg.dg * (deg.dg - 1)) AS q " +
      "FROM deg LEFT JOIN tv ON tv.v = deg.n WHERE deg.dg >= 2) " +
      "SELECT CAST(count(*) AS BIGINT) AS n_nodes, " +
      "CAST(SUM(CASE WHEN q = 1000000 THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_perfect, " +
      OSql.sround("CAST(SUM(q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e6)",
        6) + " AS avg_local_cc FROM cc"))

  // ------------------------------------------------------------------
  // graph_closeness_seeded — closeness and harmonic centrality of the
  // 't:purchase' seed, the CENTRALITY readout over the same 4-round
  // BFS relaxation as [[graphBfsDepth]] (that key histograms depths;
  // this reduces them to the two standard centrality scores — and
  // harmonic is the one that stays meaningful on disconnected graphs,
  // which is why both ship): over reached nodes at dist ≥ 1,
  // closeness = n_reached/Σdist as the exact floor-quantized integer
  // (10⁶·n) div Σd, and harmonic = Σ 1/d with each reciprocal the
  // exact integer 10⁹ div d BEFORE the sum — an order-independent
  // integer reduction (the quantized-harmonic discipline from the BY
  // step-up). Same superstep plan: one equi-join + groupBy-min per
  // round; one scalar row out.
  // ------------------------------------------------------------------

  private val graphClosenessSeeded = Q(
    "graph_closeness_seeded",
    (s, d) => {
      import s.implicits._
      bfsDist(s, d).filter($"dist" >= 1).agg(
          count(lit(1)).as("n_reached"),
          sum($"dist").cast("long").as("sum_dist"),
          sum(expr("1000000000 div dist")).cast("long").as("harmonic_q"))
        .select($"n_reached", $"sum_dist",
          when($"sum_dist" > 0, expr("(1000000 * n_reached) div sum_dist"))
            .cast("long").as("closeness_q"),
          $"harmonic_q")
    },
    Some("WITH pairs AS (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) " +
      "AS src, 't:' || event_type AS dst FROM events), " +
      "edges AS (SELECT src, dst FROM pairs " +
      "UNION ALL SELECT dst, src FROM pairs), " +
      "d0 AS (SELECT 't:purchase' AS node, CAST(0 AS BIGINT) AS dist), " +
      "d1 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d0 " +
      "UNION ALL SELECT e.dst, d.dist + 1 FROM edges e " +
      "JOIN d0 d ON e.src = d.node) GROUP BY 1), " +
      "d2 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d1 " +
      "UNION ALL SELECT e.dst, d.dist + 1 FROM edges e " +
      "JOIN d1 d ON e.src = d.node) GROUP BY 1), " +
      "d3 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d2 " +
      "UNION ALL SELECT e.dst, d.dist + 1 FROM edges e " +
      "JOIN d2 d ON e.src = d.node) GROUP BY 1), " +
      "d4 AS (SELECT node, min(dist) AS dist FROM (SELECT node, dist FROM d3 " +
      "UNION ALL SELECT e.dst, d.dist + 1 FROM edges e " +
      "JOIN d3 d ON e.src = d.node) GROUP BY 1), " +
      "r AS (SELECT CAST(count(*) AS BIGINT) AS n_reached, " +
      "CAST(SUM(dist) AS BIGINT) AS sum_dist, " +
      "CAST(SUM(1000000000 // dist) AS BIGINT) AS harmonic_q " +
      "FROM d4 WHERE dist >= 1) " +
      "SELECT n_reached, sum_dist, " +
      "CASE WHEN sum_dist > 0 THEN " +
      "CAST((1000000 * n_reached) // sum_dist AS BIGINT) END AS closeness_q, " +
      "harmonic_q FROM r"))

  val qs: Seq[Q] = Seq(
    graphBfsDepth, graphAdamicAdar, graphJaccardNeighbors, seqPatternRegex,
    sampleNegative, simMaxsimLabels, graphKcorePeel, dedupFuzzyLevenshtein,
    graphModularity, graphAssortativity, graphLocalClustering,
    graphClosenessSeeded)
}

package graft

/** Laws for the graph-mining / pattern / negative-sampling wave
  * (MiningOps): crafted tables through the REAL query functions.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  private val ns = (ms: Long) => ms * 1000000L

  private def ev(rows: Seq[(Long, Long, Long, String, Double, String)]) =
    rows.map { case (id, ms, u, t, v, p) => (id, ns(ms), u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  // ---------------------------------------------------------------- BFS

  test("BFS depths alternate type/user layers on the bipartite graph") {
    // u1: purchase + A; u2: A only →
    // depth 0 t:purchase, 1 u:1, 2 t:A, 3 u:2
    val rows = Seq(
      (1L, 1000L, 1L, "purchase", 1.0, "{}"),
      (2L, 2000L, 1L, "A", 1.0, "{}"),
      (3L, 3000L, 2L, "A", 1.0, "{}"))
    val got = run("graph_bfs_depth", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("BFS never revisits: an already-settled node keeps its first depth") {
    // u1 touches both types — t:A is reachable at depth 2 and must not
    // drift deeper on later rounds
    val rows = Seq(
      (1L, 1000L, 1L, "purchase", 1.0, "{}"),
      (2L, 2000L, 1L, "A", 1.0, "{}"),
      (3L, 3000L, 2L, "purchase", 1.0, "{}"),
      (4L, 4000L, 2L, "A", 1.0, "{}"))
    val got = run("graph_bfs_depth", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // depth 0: t:purchase; depth 1: u1, u2; depth 2: t:A; nothing at 3+
    assert(got === Map(0L -> 1L, 1L -> 2L, 2L -> 1L))
  }

  // -------------------------------------------------------- Adamic-Adar

  test("Adamic-Adar downweights common neighbors by basket size") {
    val li = Seq(
      (1L, 101L), (1L, 102L),              // order 1: parts 101,102 (deg 2)
      (2L, 101L), (2L, 102L), (2L, 103L))  // order 2: deg 3
      .toDF("l_orderkey", "l_partkey")
    val got = run("graph_adamic_adar", stageTables("lineitem" -> li)).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // (101,102): 1/ln2 + 1/ln3 = 2.352934; (101,103) & (102,103): 1/ln3
    assert(got((101L, 102L)) === ((2L, 2.352934)))
    assert(got((101L, 103L)) === ((1L, 0.910239)))
    assert(got((102L, 103L)) === ((1L, 0.910239)))
  }

  test("neighborhood Jaccard normalizes by both degrees, counting singleton orders") {
    val li = Seq(
      (1L, 101L), (1L, 102L),  // o1: {101,102}
      (2L, 101L), (2L, 102L),  // o2: {101,102}
      (3L, 101L), (3L, 103L),  // o3: {101,103}
      (4L, 103L))              // o4: singleton — counts toward 103's degree only
      .toDF("l_orderkey", "l_partkey")
    val got = run("graph_jaccard_neighbors", stageTables("lineitem" -> li)).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // N(101)={1,2,3}, N(102)={1,2}, N(103)={3,4}
    assert(got((101L, 102L)) === ((2L, 0.666667))) // 2/(3+2-2)
    assert(got((101L, 103L)) === ((1L, 0.25)))     // 1/(3+2-1): singleton in the union
    assert(got.size === 2) // 102,103 never co-occur: no candidate pair
  }

  test("assortativity: a star is exactly -1, a regular triangle is NULL") {
    // star S3 via three 2-part baskets sharing hub 100: every edge
    // links deg 3 to deg 1 → r = -1 exactly
    val star = Seq((1L, 100L), (1L, 101L), (2L, 100L), (2L, 102L),
      (3L, 100L), (3L, 103L)).toDF("l_orderkey", "l_partkey")
    val r = run("graph_assortativity", stageTables("lineitem" -> star))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((4L, 3L)))
    assert(r.getDouble(2) === -1.0)
    // triangle: all degrees equal → zero degree variance → NULL, not 0/0
    val tri = Seq((1L, 101L), (1L, 102L), (1L, 103L))
      .toDF("l_orderkey", "l_partkey")
    val r2 = run("graph_assortativity", stageTables("lineitem" -> tri))
      .collect()(0)
    assert((r2.getLong(0), r2.getLong(1)) === ((3L, 3L)))
    assert(r2.isNullAt(2))
  }

  test("single-part orders contribute nothing to Adamic-Adar") {
    val li = Seq((1L, 101L), (2L, 101L), (2L, 102L))
      .toDF("l_orderkey", "l_partkey")
    val got = run("graph_adamic_adar", stageTables("lineitem" -> li)).collect()
    assert(got.length === 1)
    assert((got(0).getLong(0), got(0).getLong(1)) === ((101L, 102L)))
    assert(got(0).getDouble(3) === 1.442695) // only order 2's weight
  }

  // ----------------------------------------------------- pattern regex

  test("funnel pattern s[cv]*p counts non-overlapping completions per user") {
    val rows = Seq(
      // u1: s,c,v,p → one match
      (1L, 1000L, 1L, "signup", 1.0, "{}"), (2L, 2000L, 1L, "click", 1.0, "{}"),
      (3L, 3000L, 1L, "view", 1.0, "{}"), (4L, 4000L, 1L, "purchase", 1.0, "{}"),
      // u2: s,p,s,p → two matches
      (5L, 1000L, 2L, "signup", 1.0, "{}"), (6L, 2000L, 2L, "purchase", 1.0, "{}"),
      (7L, 3000L, 2L, "signup", 1.0, "{}"), (8L, 4000L, 2L, "purchase", 1.0, "{}"),
      // u3: p,c → zero (purchase precedes signup)
      (9L, 1000L, 3L, "purchase", 1.0, "{}"), (10L, 2000L, 3L, "click", 1.0, "{}"))
    val got = run("seq_pattern_regex", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("an error event breaks funnel contiguity") {
    // s,e,p — the error's 'e' sits between signup and purchase, and
    // the pattern only bridges clicks/views
    val rows = Seq(
      (1L, 1000L, 1L, "signup", 1.0, "{}"),
      (2L, 2000L, 1L, "error", 1.0, "{}"),
      (3L, 3000L, 1L, "purchase", 1.0, "{}"))
    val got = run("seq_pattern_regex", stageTables("events" -> ev(rows))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L))
  }

  // ------------------------------------------------------------ MaxSim

  test("MaxSim keeps each probe's best match and averages per group") {
    // probes: label 0 = e1, label 1 = (0.6, 0.8); corpus label 2 holds
    // e1 and e2 → label-0 probe maxes at 1.0 (e1), label-1 probe maxes
    // at 0.8 (e2) — the mean-of-max never mixes the directions
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(0.6f, 0.8f, 0f, 0f), 1),
      (3L, Array(1f, 0f, 0f, 0f), 2),
      (4L, Array(0f, 1f, 0f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = run("sim_maxsim_labels", stageTables("embeddings" -> emb)).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got((0, 2)) === ((1L, 1.0)))
    assert(got((1, 2)) === ((1L, 0.8)))
  }

  test("local clustering: triangle nodes hit 1, the hub averages in its pendant") {
    // triangle {1,2,3} + pendant 4 on node 1: nodes 2,3 are perfectly
    // clustered (cc 1), hub 1 has one closed pair of three (cc 1/3),
    // degree-1 node 4 is excluded → avg = (1/3 + 1 + 1)/3 = 0.777778
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val r = run("graph_local_clustering", stageTables("lineitem" -> li))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert(r.getDouble(2) === 0.777778)
  }

  // ------------------------------------------------------------ k-core

  test("2-core peeling drops the pendant and keeps the triangle") {
    // parts 1-2-3 form a triangle (each pair co-ordered); part 4 hangs
    // off part 1 with degree 1 → round 1 peels it, the triangle is the
    // stable 2-core after exactly one effective round
    val li = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 3L),
      (4L, 1L), (4L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val got = run("graph_kcore_peel", stageTables("lineitem" -> li)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 3L, 3L)))
  }

  test("2-core peeling loops past three rounds: a 10-node path needs five") {
    // a pure path p0-p1-…-p9 (each order = one edge) peels two pendant
    // vertices per round: 9 → 7 → 5 → 3 → 1 → 0 edges, so the empty
    // 2-core is only reached at round 5 — a bounded 3-round peel would
    // misreport a nonempty core; this pins the loop-until-stable
    val li = (0L until 9L).flatMap(i =>
      Seq((100L + i, i), (100L + i, i + 1)))
      .toDF("l_orderkey", "l_partkey")
    val got = run("graph_kcore_peel", stageTables("lineitem" -> li)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((5L, 0L, 0L)))
  }

  test("label propagation: communities keep their labels, ties go to the smallest") {
    val ns = (ms: Long) => ms * 1000000L
    // users 0,3 (seed label 0) touch only type "a"; users 1,4 (label 1)
    // touch only "b" → a→0, b→1 and both communities survive intact.
    // type "c" sees one label-0 user (6) and one label-1 user (7):
    // tied majority → smallest label (0); user 7 touches ONLY c, so the
    // tie rule reassigns it from 1 to 0 — the deterministic crossover
    // the oracle must reproduce exactly.
    val rows = Seq(
      (1L, 0L, "a"), (2L, 3L, "a"), (3L, 0L, "a"),
      (4L, 1L, "b"), (5L, 4L, "b"),
      (6L, 6L, "c"), (7L, 7L, "c"))
      .zipWithIndex.map { case ((eid, uid, et), i) =>
        (eid, ns(1000L * i), uid, et, 1.0, "{}")
      }
    val dir = stageTables("events" ->
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = run("graph_label_propagation", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // label 0: users 0, 3, 6 (their own community) + 7 (tie-flipped via c)
    assert(got(0L) === ((4L, 16L, 2L)), "0+3+6+7 = checksum 16; types a and c")
    assert(got(1L) === ((2L, 5L, 1L)), "users 1, 4 keep label 1 via type b")
    assert(!got.contains(2L), "no user ends on label 2 in this fixture")
  }

  // --------------------------------------------------- fuzzy Levenshtein

  test("modularity credits within-brand co-purchase edges against degree chance") {
    val li = Seq(
      (1L, 1L), (1L, 2L),   // o1: within brand A
      (2L, 3L), (2L, 4L),   // o2: within brand B
      (3L, 2L), (3L, 3L))   // o3: crosses brands
      .toDF("l_orderkey", "l_partkey")
    val pt = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("p_partkey", "p_brand")
    val got = run("graph_modularity",
      stageTables("lineitem" -> li, "part" -> pt)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // m = 3 edges; each brand: e_c = 1, d_c = 3 → term = (12−9)/36 = 1/12;
    // Q = 2/12 = 0.166667 — positive: brands beat the degree-chance mix
    assert(got("A") === ((2L, 3L, 1L, 0.166667)))
    assert(got("B") === ((2L, 3L, 1L, 0.166667)))
  }

  test("fuzzy dedup pairs within-brand near-identical names; length band prunes") {
    val part = Seq(
      (1L, "red bolt", "X"), (2L, "red colt", "X"),    // distance 1
      (3L, "zzzzzzzzzzzzzz", "X"),                      // length-band pruned
      (4L, "blue gear", "Y"), (5L, "blue gear", "Y"))   // exact duplicate
      .toDF("p_partkey", "p_name", "p_brand")
    val got = run("dedup_fuzzy_levenshtein", stageTables("part" -> part)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("X") === ((1L, 1L, 0L)))   // one candidate, fuzzy, not exact
    assert(got("Y") === ((1L, 1L, 1L)))   // exact dup is also a fuzzy pair
  }

  // ------------------------------------------------------------ itemset3

  test("triple supports count users holding all three types") {
    val rows = Seq(
      (1L, 1000L, 1L, "A", 1.0, "{}"), (2L, 1001L, 1L, "B", 1.0, "{}"),
      (3L, 1002L, 1L, "C", 1.0, "{}"),
      (4L, 1003L, 2L, "A", 1.0, "{}"), (5L, 1004L, 2L, "B", 1.0, "{}"),
      (6L, 1005L, 3L, "A", 1.0, "{}"), (7L, 1006L, 3L, "B", 1.0, "{}"),
      (8L, 1007L, 3L, "C", 1.0, "{}"), (9L, 1008L, 3L, "D", 1.0, "{}"))
    val got = run("assoc_itemset3", stageTables("events" -> ev(rows))).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got(("A", "B", "C")) === 2L)
    assert(got(("A", "B", "D")) === 1L)
    assert(got.size === 4)  // ABC, ABD, ACD, BCD
  }

  // ------------------------------------------------------------- recency

  test("recency measures time since the STRICTLY previous purchase") {
    val rows = Seq(
      (1L, 1000L, 1L, "view", 1.0, "{}"),
      (2L, 2000L, 1L, "purchase", 1.0, "{}"),
      (3L, 3000L, 1L, "view", 1.0, "{}"),
      (4L, 4000L, 1L, "purchase", 1.0, "{}"),
      (5L, 5000L, 1L, "view", 1.0, "{}"))
    val got = run("feature_recency", stageTables("events" -> ev(rows))).collect()
    assert(got(0).isNullAt(3) && got(1).isNullAt(3))  // nothing strictly before
    assert(got(2).getLong(3) === 1000L)
    assert(got(3).getLong(3) === 2000L)  // its own purchase doesn't count
    assert(got(4).getLong(3) === 1000L)
  }

  // -------------------------------------------------- negative sampling

  test("negative sampling assigns only never-seen buckets") {
    // observed buckets {1, 2}; u1 saw only 1 → negative {2};
    // u2 saw both → nothing to assign
    val rows = Seq(
      (1L, 1000L, 1L, "view", 1.0, "{\"k\": 1}"),
      (2L, 2000L, 2L, "view", 1.0, "{\"k\": 1}"),
      (3L, 3000L, 2L, "view", 1.0, "{\"k\": 2}"))
    val got = run("sample_negative", stageTables("events" -> ev(rows))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((2L, 1L, 1L)))
  }

  test("negative sampling caps at two buckets per user") {
    // u1 saw bucket 1 of domain {1,2,3,4} (u2 covers the rest) → u1
    // gets exactly 2 of its 3 unseen buckets
    val rows = Seq(
      (1L, 1000L, 1L, "view", 1.0, "{\"k\": 1}"),
      (2L, 2000L, 2L, "view", 1.0, "{\"k\": 2}"),
      (3L, 3000L, 2L, "view", 1.0, "{\"k\": 3}"),
      (4L, 4000L, 2L, "view", 1.0, "{\"k\": 4}"))
    val got = run("sample_negative", stageTables("events" -> ev(rows))).collect()
    val u1Assignments = got.map(r => r.getLong(1)).sum
    // u1 contributes 2 picks, u2 contributes 1 (only bucket 1 unseen)
    assert(u1Assignments === 3L)
  }
}

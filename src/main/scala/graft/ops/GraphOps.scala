package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}

/** Iterative graph analytics beyond connected components
  * (`dedup_cluster`): link analysis over a graph DERIVED from the
  * relational archive. The engine's graphs are always derived — there
  * is no edge table in the reference's data model — so the operator
  * demonstrates the full path: relation → edge list → iterative
  * fixpoint, all in DataFrame operations (the same co-partitioned
  * join-per-superstep shape GraphX's Pregel lowers to, without leaving
  * Catalyst/Tungsten or the columnar scan).
  */
object GraphOps {

  /** PageRank over the bipartite user ↔ event-type interaction graph
    * (distinct (user, type) pairs, both edge directions), 2 unrolled
    * power iterations, damping 0.85.
    *
    * Determinism is the interesting design problem: PageRank sums float
    * contributions in engine-chosen order, which can never hash-match
    * across engines. This implementation runs ENTIRELY IN INTEGER
    * ARITHMETIC — ranks are scaled to 1e10, contributions are truncating
    * integer divisions (`div` here, `//` in DuckDB — identical on
    * non-negatives), and damping is (85·s) div 100 — so both engines
    * produce bit-identical BIGINT ranks in any summation order, the
    * same trick the IVF k-means uses for its centroids. Headroom: total
    * rank mass is N·1e10 ≤ 1e16 for N ≤ 10^6 nodes, and the 85× blowup
    * stays under 10^18 < Long.Max.
    *
    * Scale shape: each iteration is ONE equi-join (edges ⋈ ranks on
    * src — both sides hash-partitioned by src, so consecutive
    * iterations reuse the partitioning) and ONE partial+final agg by
    * dst; nothing else. Every node has in-edges (edges are symmetric),
    * so no dangling-mass correction term is needed. At 100 TB the edge
    * list is the big side and ranks the small side; the join stays
    * shuffle-light because ranks arrive already partitioned from the
    * previous iteration's agg. Iteration count is fixed (2) for the
    * verified key — convergence looping belongs to the caller, as in
    * `dedup_cluster`.
    */
  private val Scale = 10000000000L
  private val Teleport = Scale * 15L / 100L

  private[graft] def pagerankRanks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.events(s, d)
      .select(concat(lit("u:"), $"user_id".cast("string")).as("src"),
        concat(lit("t:"), $"event_type").as("dst"))
      .distinct()
    val edges = pairs.unionByName(pairs.select($"dst".as("src"), $"src".as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesD = edges.join(deg, "src")
    var ranks = deg.select($"src".as("node"), lit(Scale).as("rank"))
    for (_ <- 1 to 2) {
      ranks = edgesD.join(ranks, edgesD("src") === ranks("node"))
        .select($"dst", expr("rank div deg").as("c"))
        .groupBy("dst")
        .agg(sum($"c").as("s"))
        .select($"dst".as("node"),
          (lit(Teleport) + expr("(85 * s) div 100")).as("rank"))
    }
    ranks
  }

  private val graphPagerank = Q(
    "graph_pagerank",
    (s, d) => {
      import s.implicits._
      pagerankRanks(s, d).orderBy($"rank".desc, $"node").limit(20)
    },
    Some("WITH pairs AS (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src, " +
      "'t:' || event_type AS dst FROM events), " +
      "edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs), " +
      "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1), " +
      "r0 AS (SELECT src AS node, CAST(10000000000 AS BIGINT) AS rank FROM deg), " +
      "c1 AS (SELECT e.dst, sum(r.rank // d.deg) AS s " +
      "FROM edges e JOIN deg d ON e.src = d.src JOIN r0 r ON e.src = r.node GROUP BY 1), " +
      "r1 AS (SELECT dst AS node, CAST(1500000000 + (85 * s) // 100 AS BIGINT) AS rank FROM c1), " +
      "c2 AS (SELECT e.dst, sum(r.rank // d.deg) AS s " +
      "FROM edges e JOIN deg d ON e.src = d.src JOIN r1 r ON e.src = r.node GROUP BY 1), " +
      "r2 AS (SELECT dst AS node, CAST(1500000000 + (85 * s) // 100 AS BIGINT) AS rank FROM c2) " +
      "SELECT node, rank FROM r2 ORDER BY rank DESC, node LIMIT 20"))

  /** Connected components via LARGE-STAR/SMALL-STAR contraction as a
    * DECLARED key — not just `dedup_cluster`'s past-the-diameter-cap
    * fallback. The two keys cluster the SAME banded-MinHash candidate
    * graph ([[LlmPipeline.candidateEdges]]) with different algorithms:
    * min-label propagation is O(diameter) rounds (right for near-dup
    * quasi-cliques, diameter ≈ 2); star contraction is O(log n) rounds
    * regardless of diameter (right for chain-shaped graphs — citation
    * webs, edit histories). Both declare the SAME oracle string, so a
    * divergence between the two algorithms is caught by the hash gate
    * itself, and the PropertySpec law additionally pins both against a
    * union-find oracle on random graphs including chains. Declaring the
    * star path keeps it benchmarked and verified every round instead of
    * dormant until the first pathological corpus triggers it.
    */
  private val graphComponentsStar = Q(
    "graph_components_star",
    (s, d) => {
      val edges = LlmPipeline.candidateEdges(s, d)
      LlmPipeline.labeledClusters(s, LlmPipeline.starContraction(s, edges))
    },
    Some(LlmPipeline.clusterOracleSql))

  val qs: Seq[Q] = Seq(graphPagerank, graphComponentsStar)
}

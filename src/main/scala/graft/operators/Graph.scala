package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef

/** Graph analytics over the near-dup pair graph (SURVEY.md §2C
  * extension; the reference has no graph surface at all — its query
  * layer is the SQLite passthrough, sqlite_connector.py:80-115).
  * Triangle count lives with the dedup operators (Dedup.tri01); this
  * module adds PageRank — the canonical "which documents sit at the
  * center of the duplicate web" centrality a curation pipeline uses to
  * pick canonical docs by influence instead of min-id.
  *
  * Determinism contract: ranks are computed in SCALED INTEGER
  * arithmetic (rank × 10^12 as BIGINT, integer division throughout) so
  * every engine — Spark, DuckDB, anything with int64 — produces
  * bit-identical ranks regardless of summation order. Floating-point
  * PageRank cannot hash-match across engines; integer PageRank can.
  *
  * 100 TB shape: each iteration is one keyed equi-join of the rank
  * vector against the edge list plus one hash aggregation on the
  * destination — the textbook distributed PageRank step. The iteration
  * count is fixed and small; each round's output is a node-sized
  * DataFrame, never driver-collected. Lineage across rounds is
  * truncated the same way clusterPairs does it (localCheckpoint per
  * round) so the plan does not grow with the iteration count.
  */
object Graph {

  /** Fixed-iteration PageRank in scaled-integer arithmetic.
    *
    * Semantics per round (S = 10^12 scale, d = damping in percent):
    *   contrib(a→b) = r(a) div outdeg(a)
    *   r'(v) = (100 - d)·S div (100·N)  +  d·sum(contrib into v) div 100
    * All divisions floor (BIGINT `div`), so the result is exact and
    * engine-independent. The input edge list is treated as UNDIRECTED
    * (symmetrized), so every node has outdeg ≥ 1 and dangling-mass
    * redistribution never arises.
    *
    * @param edges (doc_a, doc_b) pair list, any orientation
    */
  def pageRank(edges: DataFrame, iterations: Int = 5,
      dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1,50]")
    val S = 1000000000000L // 10^12 rank scale
    val e = edges.select(col("doc_a").cast("bigint").as("a"),
        col("doc_b").cast("bigint").as("b"))
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b"))).distinct()
      .persist() // reused every iteration; node-count sized at test SF
    val deg = sym.groupBy("a").agg(count(lit(1)).as("outdeg"))
    val nodes = sym.select(col("a").as("v")).distinct()
    // N as a broadcast 1-row aggregate — never a driver collect
    val nc = nodes.agg(count(lit(1)).as("nn"))
    var ranks = nodes.crossJoin(broadcast(nc))
      .select(col("v"), expr(s"${S}L div nn").as("r"))
    for (_ <- 1 to iterations) {
      val contrib = ranks
        .join(sym, ranks("v") === sym("a"))
        .join(deg.withColumnRenamed("a", "v2"), col("a") === col("v2"))
        .select(col("b").as("v"), expr("r div outdeg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("csum"))
      ranks = nodes.join(contrib, Seq("v"), "left")
        .crossJoin(broadcast(nc))
        .select(col("v"), expr(
          s"(${100 - dampingPct}L * ${S}L) div (100L * nn)" +
            s" + (${dampingPct}L * coalesce(csum, 0L)) div 100L").as("r"))
        // truncate lineage each round (clusterPairs' contract): the plan
        // stays O(1) per round, and after the last round the rank table
        // no longer references the edge cache, which can be released
        .localCheckpoint(true)
    }
    sym.unpersist(false)
    ranks.select(col("v").as("doc_id"), col("r").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("doc_id"))
  }

  // Oracle: the same five rounds unrolled as a CTE chain (bpe01's
  // pattern) in the same scaled-integer arithmetic — `//` in DuckDB
  // floors exactly like Spark's `div`.
  private def prRound(i: Int): String = {
    val prev = if (i == 1) "r0" else s"r${i - 1}"
    s"""r$i AS (SELECT n.v,
        (15 * 1000000000000) // (100 * (SELECT nn FROM nc))
          + (85 * COALESCE(s.csum, 0)) // 100 AS r
      FROM nodes n LEFT JOIN (
        SELECT e.b AS v, CAST(SUM(r.r // d.outdeg) AS BIGINT) AS csum
        FROM $prev r JOIN e ON e.a = r.v JOIN deg d ON d.a = r.v
        GROUP BY e.b) s ON s.v = n.v)"""
  }

  private val pr01 = QueryDef(
    "pr01_pagerank",
    (s, dir) => pageRank(Dedup.ngramPairEdges(s, dir)),
    Some(s"""WITH ${Dedup.edgesOracle},
      e AS (SELECT doc_a AS a, doc_b AS b FROM p
        UNION SELECT doc_b, doc_a FROM p),
      deg AS (SELECT a, COUNT(*) AS outdeg FROM e GROUP BY a),
      nodes AS (SELECT DISTINCT a AS v FROM e),
      nc AS (SELECT COUNT(*) AS nn FROM nodes),
      r0 AS (SELECT v, 1000000000000 // (SELECT nn FROM nc) AS r FROM nodes),
      ${(1 to 5).map(prRound).mkString(",\n      ")}
      SELECT v AS doc_id, CAST(r AS BIGINT) AS rank_scaled FROM r5
      ORDER BY rank_scaled DESC, doc_id"""),
  )

  /** Multi-source shortest hop counts (BFS) over an undirected edge
    * list — "how far does contamination spread from these seed
    * documents through the duplicate web", the reachability question a
    * forget-cascade or leakage audit asks after gov01 identifies bad
    * seeds. Every node with id < `seedBelow` is a 0-hop source; the
    * output is each reached node's distance to its NEAREST seed.
    * Unreached nodes are omitted (their distance is infinite).
    *
    * 100 TB shape: the textbook distributed frontier relaxation — each
    * round is one keyed equi-join of the current distance vector
    * against the edge list plus one min-aggregation on the destination;
    * rounds are bounded by `maxHops`, each round's state is one row per
    * node, and lineage is truncated per round (localCheckpoint, the
    * pageRank/clusterPairs contract). Nothing is ever driver-collected.
    * The oracle walks the same graph with a recursive CTE (UNION, so
    * (v, d) states dedup and the recursion is finite).
    */
  def shortestHops(edges: DataFrame, maxHops: Int = 6,
      seedBelow: Long = 10L): DataFrame = {
    require(maxHops >= 1 && maxHops <= 32, "maxHops in [1,32]")
    val e = edges.select(col("doc_a").cast("bigint").as("a"),
        col("doc_b").cast("bigint").as("b"))
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b"))).distinct()
      .persist()
    val nodes = sym.select(col("a").as("v")).distinct()
    var dist = nodes
      .select(col("v"),
        when(col("v") < seedBelow, 0L).otherwise(lit(null).cast("bigint")).as("d"))
    for (_ <- 1 to maxHops) {
      val relaxed = dist.filter(col("d").isNotNull)
        .join(sym, col("v") === col("a"))
        .select(col("b").as("v"), (col("d") + 1L).as("nd"))
        .groupBy("v").agg(min(col("nd")).as("nd"))
      // least() skips nulls: an unreached node adopts the new distance
      dist = dist.join(relaxed, Seq("v"), "left")
        .select(col("v"), least(col("d"), col("nd")).as("d"))
        .localCheckpoint(true)
    }
    sym.unpersist(false)
    dist.filter(col("d").isNotNull)
      .select(col("v").as("doc_id"), col("d").as("hops"))
      .orderBy(col("hops"), col("doc_id"))
  }

  private val gr02 = QueryDef(
    "gr02_shortest_hops",
    (s, dir) => shortestHops(Dedup.ngramPairEdges(s, dir)),
    Some(s"""WITH RECURSIVE ${Dedup.edgesOracle},
      e AS (SELECT doc_a AS a, doc_b AS b FROM p
        UNION SELECT doc_b, doc_a FROM p),
      walk(v, d) AS (
        SELECT DISTINCT a, 0 FROM e WHERE a < 10
        UNION
        SELECT e.b, w.d + 1 FROM walk w JOIN e ON e.a = w.v WHERE w.d < 6)
      SELECT v AS doc_id, CAST(MIN(d) AS BIGINT) AS hops
      FROM walk GROUP BY v ORDER BY hops, doc_id"""),
  )

  /** Connected components via alternating LARGE-STAR / SMALL-STAR
    * rounds (Kiveris et al. 2014) — the MapReduce-standard CC
    * algorithm, implemented INDEPENDENTLY of [[Dedup.clusterPairs]]'
    * min-label propagation and held to the same oracle (dd07's
    * recursive closure): two different algorithms, one answer.
    * Why it exists at 100 TB: label propagation takes diameter-many
    * rounds (a long path = a long job); star contraction converges in
    * O(log² n) rounds regardless of diameter, each round two
    * groupBy-min aggregations plus a join — the right choice for
    * high-diameter graphs (chained duplicates, link graphs).
    *
    * Round mechanics on canonical (hi > lo) edges:
    *  - large-star: for each node u over the SYMMETRIC neighborhood,
    *    m(u) = min(Γ(u) ∪ {u}); every larger neighbor v > u re-points
    *    to m(u) — long chains fold toward minima in parallel;
    *  - small-star: within each hi's smaller-neighbor set, everything
    *    re-points to the minimum.
    * The loop exits when a composite round is a fixpoint (the star
    * forest), checked by exact set equality; every round's state is
    * localCheckpoint'd (the pageRank/clusterPairs lineage contract).
    */
  def connectedComponentsStar(edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    val raw = edges.select(col("doc_a").cast("bigint").as("a"),
        col("doc_b").cast("bigint").as("b"))
      .filter(col("a") =!= col("b"))
    val nodes = raw.select(col("a").as("v"))
      .union(raw.select(col("b").as("v"))).distinct().persist()
    var e = raw.select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .distinct().localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // large-star over the symmetric neighborhood
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = sym.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
      // small-star within each hi's smaller-neighbor set
      val m2 = ls.groupBy("hi").agg(min(col("lo")).as("m"))
      val ss = ls.join(m2, "hi")
        .select(explode(array(
          struct(col("hi").as("x"), col("m").as("y")),
          struct(col("lo").as("x"), col("m").as("y")))).as("p"))
        .select(col("p.x").as("hi"), col("p.y").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
        .localCheckpoint(true)
      converged = ss.count() == e.count() && ss.exceptAll(e).isEmpty
      e = ss
      round += 2
    }
    require(converged, s"star contraction did not converge in $maxRounds rounds")
    // at the fixpoint e IS a star forest: hi -> component minimum
    val starMap = e.select(col("hi").as("v"), col("lo").as("root"))
    val out = nodes.join(starMap, Seq("v"), "left")
      .select(col("v").as("doc_id"),
        coalesce(col("root"), col("v")).as("cluster_id"))
      .orderBy("doc_id")
    nodes.unpersist(false)
    out
  }

  // Shares dd07's oracle shape: the recursive closure's per-node
  // reachable minimum — the graph-theoretic ground truth both CC
  // implementations must match.
  private val gr03 = QueryDef(
    "gr03_cc_star",
    (s, dir) => connectedComponentsStar(Dedup.ngramPairEdges(s, dir)),
    Some(s"""${Dedup.closureOracle}
      SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach
      GROUP BY a ORDER BY doc_id"""),
  )

  /** k-core decomposition by iterative peeling: repeatedly drop nodes
    * of degree < k until none remain; what survives is the maximal
    * subgraph where every node keeps ≥ k neighbors — the standard
    * "dense duplicate clique" detector (a chain of coincidental
    * near-dups peels away; a boilerplate family survives). Output is
    * each surviving node with its IN-CORE degree.
    *
    * 100 TB shape: each round is one degree aggregation plus two
    * semi-joins of the edge list against the surviving-node set — all
    * key-partitioned, nothing driver-side; state is the edge list
    * itself, monotonically shrinking, lineage truncated per round
    * (the pageRank/clusterPairs contract). Early exit on fixpoint
    * (edge count is monotone, so equality = converged).
    *
    * Determinism/oracle contract: peeling past the fixpoint is
    * IDEMPOTENT, so the oracle replays a fixed unroll of `oracleRounds`
    * rounds while Spark exits early — identical results whenever both
    * budgets cover true convergence, which the require() guards on the
    * Spark side and the spec pins at test SFs.
    */
  def kCore(edges: DataFrame, k: Int = 2, maxRounds: Int = 50): DataFrame = {
    require(k >= 1, "k >= 1")
    val raw = edges.select(col("doc_a").cast("bigint").as("a"),
        col("doc_b").cast("bigint").as("b"))
      .filter(col("a") =!= col("b"))
    var sym = raw.union(raw.select(col("b").as("a"), col("a").as("b"))).distinct()
      .localCheckpoint(true)
    var n = sym.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val keep = sym.groupBy("a").agg(count(lit(1)).as("c"))
        .filter(col("c") >= k).select("a")
      val next = sym.join(keep, Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("a", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(true)
      val nn = next.count()
      converged = nn == n
      sym = next; n = nn; round += 1
    }
    require(converged, s"k-core peel did not converge in $maxRounds rounds")
    sym.groupBy("a").agg(count(lit(1)).as("core_deg"))
      .select(col("a").as("doc_id"), col("core_deg"))
      .orderBy("doc_id")
  }

  // One oracle peel round: degree filter + edge restriction. MATERIALIZED
  // is load-bearing: each e_i is referenced twice by round i+1 (directly
  // and through k_{i+1}), so DuckDB's default CTE inlining would
  // re-evaluate the chain EXPONENTIALLY (2^rounds scans — observed as
  // "too many open files" at 24 inlined rounds); materializing makes the
  // chain linear, one evaluation per round.
  private def kcRound(i: Int, k: Int): String = {
    val prev = s"e${i - 1}"
    s"""k$i AS MATERIALIZED (SELECT a FROM $prev GROUP BY a HAVING COUNT(*) >= $k),
      e$i AS MATERIALIZED (SELECT a, b FROM $prev
        WHERE a IN (SELECT a FROM k$i) AND b IN (SELECT a FROM k$i))"""
  }

  // true convergence measured at sf0.01 is 2 rounds (dense near-dup
  // clusters peel fast); 8 is a 4x margin, and extra rounds are no-ops
  private val OracleRounds = 8

  private val gr04 = QueryDef(
    "gr04_kcore",
    (s, dir) => kCore(Dedup.ngramPairEdges(s, dir), k = 2),
    Some(s"""WITH ${Dedup.edgesOracle},
      e0 AS (SELECT doc_a AS a, doc_b AS b FROM p
        UNION SELECT doc_b, doc_a FROM p),
      ${(1 to OracleRounds).map(kcRound(_, 2)).mkString(",\n      ")}
      SELECT a AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_deg
      FROM e$OracleRounds GROUP BY a ORDER BY doc_id"""),
  )

  val defs: Seq[QueryDef] = Seq(pr01, gr02, gr03, gr04)
}

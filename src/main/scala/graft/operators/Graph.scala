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
        SELECT e.b AS v, SUM(r.r // d.outdeg) AS csum
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

  val defs: Seq[QueryDef] = Seq(pr01)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Skew-mitigation utilities.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most
  * runtime skew; explicit salting remains the tool when one join key
  * dominates so heavily that even split shuffle blocks hot-spot a
  * single executor — the classic 100 TB failure mode. [[saltedJoin]]
  * spreads each hot fact key over `saltFactor` synthetic sub-keys and
  * replicates the (smaller) build side to match, so the shuffle
  * distributes evenly; results are identical to the plain join.
  */
object Skew {

  private val SupportedJoinTypes = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(fact: DataFrame, build: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    // Build-preserving types (right/full_outer) would emit each
    // unmatched build row saltFactor times (the build side is
    // replicated per salt); only fact-preserving joins keep results
    // identical to the plain join.
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports fact-preserving join types ${SupportedJoinTypes.mkString(", ")}; " +
        s"got '$joinType' (right/full_outer would duplicate unmatched build rows)")
    val salted = fact.withColumn("_graft_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = build.withColumn("_graft_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "_graft_salt", joinType).drop("_graft_salt")
  }

  /** Deterministically-skewed join input for the demo/bench: ~30% of
    * lineitem rows are remapped onto ONE hot order key (l_orderkey % 10
    * ∈ {0,1,2} → key 1), the rest keep their key — the "one customer is
    * a third of the fact table" shape salting exists for. Pure column
    * expression, so the DuckDB oracle replays the same remap.
    */
  def skewedFact(lineitem: DataFrame): DataFrame =
    lineitem.select(
      when(pmod(col("l_orderkey"), lit(10)) < 3, lit(1L))
        .otherwise(col("l_orderkey")).as("okey"),
      col("l_extendedprice"))

  /** The demo aggregation: fact ⋈ build per-priority revenue. `salt` ≥ 2
    * salts the join; 1 runs it plain. The merge hint models the 100 TB
    * regime where the build side exceeds any broadcast threshold (a
    * broadcast join would sidestep the shuffle skew being demonstrated,
    * and at real scale orders does not broadcast).
    */
  def skewDemoAgg(fact: DataFrame, build: DataFrame, salt: Int): DataFrame = {
    val joined =
      if (salt <= 1) fact.join(build.hint("merge"), Seq("okey"))
      else saltedJoin(fact, build.hint("merge"), Seq("okey"), saltFactor = salt)
    joined
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  // ------------------------------------------------------------- skw01
  // Salting's correctness contract IS output-invariance: the salted
  // skewed-fact ⋈ orders (factor 8 — sized to the ~30% hot key, so the
  // hot key's rows spread to ~4% per sub-key) aggregated per priority
  // must equal the plain join — so the oracle is the UNSALTED join in
  // DuckDB, checking invariance against an independent engine rather
  // than this one's own plain join. The salted-vs-plain TIMING on an
  // 8x-replicated skewed fact is benched as xs_skew_plain /
  // xs_skew_salted (see Bench.skewBench for the honest reading).
  private val skw01 = QueryDef(
    "skw01_salted_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val build = t.orders.select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      skewDemoAgg(skewedFact(t.lineitem), build, salt = 8)
    },
    Some("""WITH f AS (SELECT CASE WHEN l_orderkey % 10 < 3 THEN 1 ELSE l_orderkey END AS okey,
          l_extendedprice
        FROM lineitem)
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM f JOIN orders ON okey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
  )

  def defs: Seq[QueryDef] = Seq(skw01)
}

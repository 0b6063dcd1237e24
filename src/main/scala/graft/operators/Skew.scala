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

  // ------------------------------------------------------------- skw01
  // Salting's correctness contract IS output-invariance: the salted
  // orders ⋈ lineitem (factor 4) aggregated per priority must equal the
  // plain join — so the oracle is the UNSALTED join in DuckDB, checking
  // the invariance against an independent engine rather than this one's
  // own plain join. (Factor 4 keeps the uniform-data demo cheap in the
  // bench; at real skew the factor scales with the hot key's share.)
  private val skw01 = QueryDef(
    "skw01_salted_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val fact = t.lineitem.select(col("l_orderkey").as("okey"), col("l_extendedprice"))
      val build = t.orders.select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      saltedJoin(fact, build, Seq("okey"), saltFactor = 4)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
  )

  def defs: Seq[QueryDef] = Seq(skw01)
}

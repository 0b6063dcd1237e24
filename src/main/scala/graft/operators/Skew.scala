package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The hierarchical prefix-scan idiom, in ONE place.
  *
  * A global running sum / rank / max is a single-partition window — the
  * scale killer every sorted-accumulation operator here avoids the same
  * way: aggregate per shard (a coarse bucket of the sort key, so shard
  * order IS sort order), scan the tiny shard-totals table for each
  * shard's EXCLUSIVE prefix ("base"), broadcast the bases back, and add
  * the within-shard window value. Users: pack01 (token prefix sum),
  * ks01 (two-cohort ECDF), fe01 (rank-quantile bins), ord02 (decile
  * rank), ord03 (descending length rank), sky01 (Pareto running max).
  *
  * The shard-totals scan intentionally runs in a single partition (one
  * row per shard — tiny by construction). Its partition key is the
  * CONSTANT-VALUED but non-foldable `shard - shard`: naming a partition
  * silences WindowExec's unpartitioned-window warning without changing
  * execution, while a `lit(0)` key would be constant-folded back to an
  * empty partition spec.
  */
private[operators] object Sharded {

  private def shardScan(shard: String): org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(col(shard) - col(shard)).orderBy(col(shard))

  /** Exclusive prefix SUM of each `(totCol, baseCol)` pair over shard
    * order: `base = sum(tot) through own row − own tot`, so the first
    * shard's base is 0 (never NULL). Returns (shard, bases...) — tiny;
    * callers broadcast-join it back.
    */
  def prefixSumBases(perShard: DataFrame, shard: String,
      totToBase: Seq[(String, String)]): DataFrame =
    totToBase.foldLeft(perShard) { case (df, (tot, base)) =>
      df.withColumn(base, sum(col(tot)).over(shardScan(shard)) - col(tot))
    }.select(shard, totToBase.map(_._2): _*)

  /** Prefix MAX over STRICTLY EARLIER shards: NULL for the first shard
    * (callers that want "no predecessor" semantics, e.g. sky01's
    * nothing-cheaper case, rely on the NULL).
    */
  def prefixMaxBefore(perShard: DataFrame, shard: String,
      tot: String, base: String): DataFrame =
    perShard.withColumn(base,
      max(col(tot)).over(shardScan(shard).rowsBetween(Window.unboundedPreceding, -1)))
      .select(shard, base)
}

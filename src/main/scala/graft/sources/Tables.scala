package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named accessors for the benchmark star schema (TESTDATA.md).
  *
  * One parquet file per table under `dir`. All reads are plain
  * `spark.read.parquet`, so Catalyst's parquet source handles column
  * pruning and predicate pushdown; callers should filter/select on the
  * returned DataFrame directly (never `.cache()` here — at 100 TB the
  * scan must stream).
  *
  * `events.ts` is written by the generator as parquet TIMESTAMP(NANOS),
  * which Spark's vectorized reader only surfaces as a nanosecond `long`
  * (`spark.sql.legacy.parquet.nanosAsLong=true`, set in
  * [[graft.GraftSession]]). We convert to a microsecond timestamp here so
  * every downstream operator sees a real timestamp column. The raw
  * nanosecond value stays available as `ts_ns`.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame   = table("region")
  def nation: DataFrame   = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame     = table("part")
  def orders: DataFrame   = table("orders")
  def lineitem: DataFrame = table("lineitem")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Events with `ts` as a usable microsecond timestamp (UTC session).
    * Integer division keeps full precision (nanos exceed 2^53, so a
    * double-typed division would corrupt timestamps).
    */
  def events: DataFrame =
    table("events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}

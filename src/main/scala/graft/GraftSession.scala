package graft

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for the graft engine.
  *
  * Centralised so the CLI, Verify, Bench and every ScalaTest suite run
  * with identical semantics:
  *  - UTC session timezone (oracle parity with DuckDB);
  *  - AQE on (runtime coalescing + skew-join splitting — the knobs that
  *    matter once this plan runs on a real cluster instead of local[32]);
  *  - shuffle partitions sized to the local core count rather than the
  *    200 default (on a real cluster this would be set per-job or left
  *    to AQE's coalescing);
  *  - nanosecond parquet timestamps surfaced as longs (the events table;
  *    see [[graft.sources.Tables]]).
  *  - state-store maintenance effectively disabled: this engine drains
  *    BOUNDED stream replays (parity queries, tests, bench passes),
  *    where background snapshot compaction buys nothing — but the
  *    maintenance thread keeps servicing every provider ever loaded,
  *    including stopped queries whose checkpoint dirs are already
  *    deleted, and its 60 s sweeps landed mid-bench as multi-second
  *    outlier passes (round-6 `unstable` flags on str03/str04/ao03).
  *    A 24/7 streaming deployment would restore the default interval —
  *    snapshot maintenance is what bounds its recovery time.
  */
object GraftSession {
  def builder(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .config("spark.ui.enabled", "false")

  /** Apply graft's required configs to an existing builder (used when the
    * caller owns master/memory settings).
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

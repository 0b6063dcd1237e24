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
      .config("spark.ui.enabled", "false")

  /** Apply graft's required configs to an existing builder (used when the
    * caller owns master/memory settings).
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

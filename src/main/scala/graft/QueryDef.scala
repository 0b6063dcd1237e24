package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (when the operation is
  * SQL-expressible) a DuckDB oracle over the same parquet tables.
  *
  * Contract notes (driver's correctness gate):
  *  - output column names must match the oracle's aliases exactly;
  *  - results must be bit-deterministic: every floating-point aggregate
  *    is computed exactly (decimal) and only then cast back to double,
  *    and every output carries a total ORDER BY.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
)

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when
  * SQL-expressible) its ANSI-SQL mirror for the driver's DuckDB oracle.
  *
  * Conventions that make the cross-engine hash-compare deterministic:
  *  - every output column is explicitly aliased, identically in both;
  *  - every query ends in an ORDER BY over a unique key;
  *  - double aggregates are rounded at the decimal granularity of their
  *    exact value (inputs have fixed decimals, so rounding is stable);
  *  - integer sums are CAST(... AS BIGINT) in DuckDB (HUGEINT otherwise);
  *  - timestamps are emitted as formatted strings, never raw (parquet
  *    ns/us precision differs across engines).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def apply(name: String, sql: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(sql))

  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None)
}

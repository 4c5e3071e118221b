package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate query: a Spark build function plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query over
  * the same parquet tables. Column names and row order match between
  * the two by construction — the driver's comparator hashes values
  * after sorting columns by name.
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val build: (SparkSession, String) => DataFrame)

object Q {
  /** Decimal-exact sum of a double expression, output as double.
    * Per-row doubles are identical across engines (same parquet
    * input, same IEEE arithmetic); casting to decimal before the
    * sum removes float-accumulation order sensitivity, so the
    * aggregate is bit-reproducible against the oracle. The matching
    * SQL shape is [[dsumSql]]. */
  def dsumSql(expr: String, scale: Int = 8): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,$scale))) AS DOUBLE)"
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AssetQueries, PipelineQueries, Q, RelationalQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registered query is a [[graft.queries.Q]]: a Spark build
  * function plus (where SQL-expressible) a DuckDB oracle over the
  * same parquet tables, with column names aligned on both sides.
  */
object SparkEntry {

  /** Full registry, one entry per implemented operator (SURVEY §2). */
  def all: Seq[Q] =
    RelationalQueries.qs ++ PipelineQueries.qs ++ AssetQueries.qs ++
      TextQueries.qs ++ VectorQueries.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's own flagship (P1 query_download_url,
    * crawler/utils.py:43-82): null-safe contains filter + projection. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_filter_contains")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

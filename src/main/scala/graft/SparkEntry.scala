package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All contract query groups (SURVEY §2). */
  private def groups: Seq[QueryGroup] = Seq(
    Scans, SourceFormats, Filters, Joins, Aggregates, Windows, SortsSets, Scalars,
    StreamingQueries, Geo, TextPipeline, Similarity, Custom, Reshape, Mining,
    Ml, Timeseries, Stats, Trajectory
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracle).toMap
}

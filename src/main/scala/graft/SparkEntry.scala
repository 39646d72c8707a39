package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.{Profiler, StandardQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full standard profile of lineitem as a long-format summary. */
  def entry(spark: SparkSession): DataFrame =
    new Profiler().summaryDF(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    StandardQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for sketch-randomized or
    * non-SQL-expressible ops (driver records a rows-only check). */
  def oracleSql: Map[String, String] = StandardQueries.oracleSql
}

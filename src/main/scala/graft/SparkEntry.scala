package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.EntryQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full CDC pipeline
    * (render wire lines → parse → filter → partition-key → marshal)
    * over the events table. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    EntryQueries.qCdcPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntryQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (crc32 bucketing, LSH/minhash candidates, language-id argmax,
    * JSON envelope rendering) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    EntryQueries.oracleSql
}

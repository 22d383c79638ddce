package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, DedupQueries, EventQueries, ExtraQueries, GraphQueries, PipelineQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship "samples per project" (examples/example.py:21-23)
    * projected onto the synthetic tables: orders per customer, sorted desc.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q02_group_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-pipeline extension surface: dedup, similarity, text, events).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      TextQueries.queries ++ EventQueries.queries ++ ExtraQueries.queries ++
      PipelineQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ DedupQueries.oracleSql ++ SimilarityQueries.oracleSql ++
      TextQueries.oracleSql ++ EventQueries.oracleSql ++ ExtraQueries.oracleSql ++
      PipelineQueries.oracleSql ++ GraphQueries.oracleSql
}

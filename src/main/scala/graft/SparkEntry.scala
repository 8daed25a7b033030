package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2 (plus the
  * training-data-pipeline extensions). `oracleSql`: DuckDB-ANSI equivalent
  * per key, run by the driver on the same parquet tables at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("sessionize_counts")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SessionQueries.queries ++
      EventQueries.queries ++
      RelationalQueries.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      TextQueries.queries ++
      FunctionQueries.queries ++
      PipelineQueries.queries ++
      SearchQueries.queries ++
      HllQueries.queries

  def oracleSql: Map[String, String] =
    SessionQueries.oracles ++
      EventQueries.oracles ++
      RelationalQueries.oracles ++
      DedupQueries.oracles ++
      SimilarityQueries.oracles ++
      TextQueries.oracles ++
      FunctionQueries.oracles ++
      PipelineQueries.oracles ++
      SearchQueries.oracles ++
      HllQueries.oracles
}

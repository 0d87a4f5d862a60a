package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.ForgetParams
import graft.core.ForgetTable
import graft.queries.ForgetQueries
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator (SURVEY.md §2);
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL for every
  * deterministic query. Names are shared between the two maps and column
  * names/aliases match exactly on both sides (the driver's compare sorts
  * columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Top-10-most-probable per distribution with expected-value decay — the
    * reference's `/nmostprobable` endpoint over every stored distribution.
    */
  def entry(spark: SparkSession): DataFrame =
    ForgetTable.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
      .topK(10, ForgetParams(rate = 0.0005, nowEpoch = ForgetQueries.Now))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ForgetQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.PipelineQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (stochastic sampled decay, etc.) -> driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    ForgetQueries.oracleSql ++
      graft.queries.RelationalQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.DedupQueries.oracleSql ++
      graft.queries.SimilarityQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql
}

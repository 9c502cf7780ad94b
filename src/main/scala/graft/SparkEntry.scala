package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Aggregations, Expressions, GraphOps, Joins, LlmOps, PipelineOps, SetOps, SourceOps, Windows}
import graft.streaming.StreamingOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator module exposes `all: Seq[Q]`; this object is the single
  * registration point the driver harness reads. A Q with `oracle = Some(sql)`
  * is hash-checked against DuckDB at sf0.01; a Q without one gets a weaker
  * rows-only check and is covered by unit/golden/property tests instead.
  */
object SparkEntry {

  /** The full SURVEY §2 inventory. */
  val allQueries: Seq[Q] =
    SourceOps.all ++ Expressions.all ++ Joins.all ++ Aggregations.all ++
      Windows.all ++ SetOps.all ++ StreamingOps.all ++ LlmOps.all ++
      PipelineOps.all ++ GraphOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped grouped aggregation over lineitem (SURVEY §7 PR1).
    */
  def entry(spark: SparkSession): DataFrame =
    Aggregations.aggHashGroupby.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's [[QueryDef]]s into the driver-facing
  * `queries` / `oracleSql` maps. Each operator from SURVEY.md §2B is one
  * entry; oracles are ANSI SQL the driver runs in DuckDB over the same
  * parquet tables.
  */
object SparkEntry {

  /** All implemented operators, grouped by module. */
  def allDefs: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.TpchExtra.defs ++
      operators.Analytics.defs ++
      operators.Behavior.defs ++
      operators.Graph.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Convert.defs ++
      operators.Multimodal.defs ++
      sources.Sources.defs ++
      streaming.Streaming.defs ++
      functions.Scalar.defs ++
      functions.TextAnalysis.defs ++
      functions.Approx.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — the canonical partial+final hash aggregation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

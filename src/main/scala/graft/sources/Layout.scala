package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Storage-layout utilities — the write-side half of scan performance.
  * At 100 TB the layout decides what a query READS: clustering gives
  * row-group min/max skipping, hive partitioning gives directory
  * pruning, bucketing removes the shuffle from every later join on the
  * bucket key. (PlanSpec verifies each property on real writes.)
  */
object Layout {

  /** Range-cluster `df` on `clusterCol` into `files` sorted files: each
    * file covers a narrow, disjoint value span, so parquet min/max
    * statistics skip whole row groups for selective range predicates. */
  def writeClustered(
      df: DataFrame, path: String, clusterCol: String,
      files: Int = 32): Unit =
    df.repartitionByRange(files, col(clusterCol))
      .sortWithinPartitions(col(clusterCol))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partition layout: one directory per `partitionCol`
    * value; equality/IN filters on it become directory pruning
    * (`PartitionFilters` at the scan). Use for low-cardinality columns
    * (date, lang, source) — high-cardinality keys belong in bucketing.
    * The pre-write repartition co-locates each value in one task:
    * without it every task opens a writer per value it holds, and
    * 10k tasks × 365 dates is a 3.65M-small-files explosion. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** Bucketed + sorted managed table: joins and aggregations on
    * `bucketCol` between tables bucketed the same way need NO exchange —
    * the steady-state layout for repeatedly-joined fact tables. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 64): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic

/** Bridge to two `private[sql]` seams of the classic Spark session —
  * the same extension pattern Delta Lake and Iceberg ship (a file in
  * an `org.apache.spark.sql.*` subpackage so `private[sql]` members
  * resolve). Used for WRITE-SIDE conf pinning: a batch ingest that
  * must plan under a specific physical-operator conf runs on a cloned
  * session (isolated SQLConf) instead of mutating and restoring the
  * caller's shared session conf, which would race concurrent queries
  * on the same session.
  */
object SessionShims {

  /** A cloned session: shares the SparkContext, shared state and a
    * COPY of the session state (conf, temp views, registered
    * functions as of the clone), so conf writes on the clone never
    * leak to the parent. */
  def cloneWithIsolatedConf(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Re-root a DataFrame's (analyzed) logical plan onto another
    * session of the same SparkContext, so it plans under THAT
    * session's SQLConf. */
  def ofRows(spark: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed)
}

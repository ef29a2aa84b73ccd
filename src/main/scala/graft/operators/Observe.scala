package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass data-quality counters — `Dataset.observe` attaches
  * aggregates that the driver collects as a side product of whatever
  * action consumes the frame. At 100 TB this is the difference between
  * "count the nulls" costing a second full scan and costing nothing:
  * the counters ride the existing pass. The natural companions are the
  * curation queries (gate rejects, null rates) and the streaming sinks
  * (per-batch row counts on the checkpointed pipeline). */
object Observe {

  /** Attach row count + per-column null counts under `obs`. Read the
    * values with `obs.get` after an action on the returned frame. */
  def withQualityMetrics(
      df: DataFrame, obs: Observation, cols: Seq[String]): DataFrame =
    df.observe(
      obs,
      count(lit(1)).as("n_rows"),
      cols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c")): _*)
}

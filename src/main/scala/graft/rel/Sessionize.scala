package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each key's event timeline into sessions
  * wherever consecutive events are more than `gapUs` apart, then aggregate
  * per session.
  *
  * Plan: ONE shuffle on the key + a per-partition sort, then two running
  * window passes (lag → session-boundary flag → running sum = session
  * ordinal) and a hash aggregate on (key, session). Both window frames are
  * running aggregates — O(1) per row, streaming through each key's sorted
  * timeline — and the final groupBy reuses the same hash partitioning, so
  * AQE coalesces it without a second exchange. Same skew caveat as
  * AsofJoin: one hot key = one reducer timeline.
  *
  * This is the batch twin of the Structured Streaming session pattern
  * (flatMapGroupsWithState + GroupStateTimeout); the batch form needs no
  * state store because the whole timeline is present.
  */
object Sessionize {

  // TIMESTAMP_NTZ-tolerant epoch micros (session tz is pinned UTC
  // everywhere in this engine, so the cast is numerically a no-op).
  private def us(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Adds `session_seq` (1-based per-key session ordinal) to each event. */
  def assign(events: DataFrame, key: String, time: String,
             gapUs: Long): DataFrame = {
    require(gapUs > 0, "gapUs must be positive")
    val order = Window.partitionBy(col(key)).orderBy(col(time).asc)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev_us", lag(us(col(time)), 1).over(order))
      .withColumn("_new_session",
        when(col("_prev_us").isNull ||
          us(col(time)) - col("_prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_new_session")).over(running))
      .drop("_prev_us", "_new_session")
  }

  /** Per-session summary: event count and span (first→last, microseconds). */
  def summarize(events: DataFrame, key: String, time: String,
                gapUs: Long): DataFrame =
    assign(events, key, time, gapUs)
      .groupBy(col(key), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(us(col(time))) - min(us(col(time))))
          .as("duration_us"))
}

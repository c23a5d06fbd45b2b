package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.constraint.Monotonic

/** Intra-key ordering (monotonicity) audit: find rows whose timestamp
  * regresses relative to the PREVIOUS row of the same key when the key's
  * rows are traversed in a declared order (ingestion sequence, file
  * position, offset). The standard late-arrival / out-of-order-delivery
  * check a validation suite runs over event and CDC feeds before
  * watermark-sensitive consumers (sessionization, as-of joins, incremental
  * checkpoints) trust the data.
  *
  * Plan: ONE shuffle on the key + a per-partition sort, then a single
  * running `lag` compare — the same shape as [[Sessionize]], and the same
  * skew caveat (one hot key = one reducer timeline; pre-shard hot keys on
  * a time prefix if a key can exceed a reducer). Strictly-equal adjacent
  * timestamps are NOT violations (non-decreasing is the invariant);
  * NULL timestamps never fire (the comparison is unproven) — consistent
  * with the null semantics of the row-constraint ADT.
  */
object OrderAudit {

  // TIMESTAMP_NTZ-tolerant epoch micros (session tz pinned UTC everywhere
  // in this engine, so the cast is numerically a no-op).
  private def us(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Violating rows: input columns plus `_t_us` (the audited value),
    * `_prev_t_us` and `_prev_ord` (the predecessor it regressed behind).
    * `timeUs` is any numeric Column (pass a derived epoch-micros column
    * for timestamp data, or a raw sequence number).
    */
  def inversions(df: DataFrame, key: String, timeUs: Column,
                 orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol).asc)
    df.withColumn("_t_us", timeUs)
      .withColumn("_prev_t_us", lag(col("_t_us"), 1).over(w))
      .withColumn("_prev_ord", lag(col(orderCol), 1).over(w))
      // NULL _prev_t_us (first row of a key) or NULL _t_us never fires
      .filter(col("_t_us") < col("_prev_t_us"))
  }

  /** Declared-constraint adapter: violation rows in the engine's
    * (key, constraint_id) sink shape for [[graft.run.Validator]].
    */
  def violations(df: DataFrame, m: Monotonic, keyCol: String): DataFrame =
    inversions(df, m.keyColumn, us(col(m.column)), m.orderColumn)
      .select(col(keyCol), lit(m.id).as("constraint_id"))
}

package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (backward temporal) join — an operator Spark lacks natively.
  *
  * For each left row, attaches the payload of the LATEST right row with the
  * same key and `right.time <= left.time` (left join: nulls when no prior
  * right row exists). Semantics match DuckDB's `ASOF LEFT JOIN ... ON
  * l.k = r.k AND l.t >= r.t`, which is the independent oracle.
  *
  * Implementation is the union+running-window plan, NOT a range join:
  * tag right rows side=0 and left rows side=1, union on (key, time, side),
  * and take a running `last(payload_struct, ignoreNulls)` over
  * `partitionBy(key).orderBy(time, side, tieBreak)` with an
  * UNBOUNDED PRECEDING .. CURRENT ROW frame. That frame is a running
  * aggregate (O(1) per row), so the whole operator costs ONE shuffle of
  * |left|+|right| rows on the key plus a per-partition sort — no candidate
  * fan-out, no inequality-join quadratic blowup. At 10^12 rows this is the
  * shape you want: both sides hash-partition on the key exactly once, and
  * a key's timeline is processed as one sorted stream.
  *
  * Skew: a hot key serializes its timeline into one reducer —
  * `asofBackwardSharded` spreads it over time shards with a boundary
  * carry (see below).
  *
  * The right payload travels as ONE struct column so a legitimately-NULL
  * payload FIELD cannot tear (a per-column `last(ignoreNulls)` would fill
  * that column from an OLDER right row than its siblings).
  *
  * Tie rules: side=0 sorts before side=1 at equal timestamps, so a right
  * row AT the left timestamp is visible (<=, matching ASOF). Among right
  * rows with identical (key, time) the greatest `tieBreak` wins,
  * deterministically.
  */
object AsofJoin {

  /** Tagged union inputs: left side=1 with null payload struct, right
    * side=0 with null left-only columns. Shared by the plain and sharded
    * variants.
    */
  private def tagged(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTime: String, rightTime: String,
                     rightPayload: Seq[String], tieBreak: String)
      : (DataFrame, DataFrame, Seq[String]) = {
    val leftRest = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTime)
    val payType = StructType(rightPayload.map(p => right.schema(p)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side"),
          lit(null).cast("long").as("_tb")) ++
        leftRest.map(col) :+
        lit(null).cast(payType).as("_pay"): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side"),
          col(tieBreak).cast("long").as("_tb")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("_pay"): _*)
    (l, r, leftRest)
  }

  private def ordered(w: org.apache.spark.sql.expressions.WindowSpec) =
    w.orderBy(col("_t").asc, col("_side").asc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def emit(df: DataFrame, keys: Seq[String], leftTime: String,
                   leftRest: Seq[String], rightPayload: Seq[String]): DataFrame =
    df.select(keys.map(col) ++ Seq(col("_t").as(leftTime)) ++ leftRest.map(col) ++
      rightPayload.map(p => col(s"_pay.$p").as(p)): _*)

  /** @param rightPayload right columns to attach (must not collide with
    *                     left column names — alias on the right first)
    * @param tieBreak     right column (castable to long) ordering
    *                     equal-timestamp right rows; the largest wins
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   rightPayload: Seq[String], tieBreak: String): DataFrame = {
    val (l, r, leftRest) =
      tagged(left, right, keys, leftTime, rightTime, rightPayload, tieBreak)
    val w = ordered(Window.partitionBy(keys.map(col): _*))
    emit(
      l.unionByName(r)
        .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
        .filter(col("_side") === 1),
      keys, leftTime, leftRest, rightPayload)
  }

  /** Hot-key (skew) mode: the same semantics with each key's timeline
    * SPREAD ACROSS `shardUs`-wide time shards, so no single reducer holds
    * a whole hot key. Three steps:
    *  1. within-shard asof — the plain running window, partitioned by
    *     (key, shard): a hot key now occupies (time-range / shardUs)
    *     reducers instead of one;
    *  2. boundary carry — per (key, shard) keep the LAST right payload
    *     (one aggregate row per shard), then prefix-fill it across the
    *     key's shard spine with a strictly-earlier running window
    *     (UNBOUNDED PRECEDING .. -1). This frame runs over #shards rows
    *     per key, not data rows — tiny by construction;
    *  3. left rows unmatched within their shard coalesce the carried
    *     payload joined back on (key, shard).
    * Equivalence with asofBackward is property-tested (RelSpec).
    */
  def asofBackwardSharded(left: DataFrame, right: DataFrame, keys: Seq[String],
                          leftTime: String, rightTime: String,
                          rightPayload: Seq[String], tieBreak: String,
                          shardUs: Long): DataFrame = {
    require(shardUs > 0, "shardUs must be positive")
    def shardOf(t: Column): Column =
      floor(unix_micros(t.cast("timestamp")) / shardUs)
    val (l, r, leftRest) =
      tagged(left, right, keys, leftTime, rightTime, rightPayload, tieBreak)
    val u = l.unionByName(r).withColumn("_shard", shardOf(col("_t")))
    val w = ordered(Window.partitionBy((keys :+ "_shard").map(col): _*))
    val within = u
      .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    // last right payload per (key, shard), on the full shard spine (both
    // sides contribute shards, so left-only shards still receive a carry)
    val shardLast = r.withColumn("_shard", shardOf(col("_t")))
      .groupBy((keys :+ "_shard").map(col): _*)
      .agg(max_by(col("_pay"), struct(col("_t"), col("_tb"))).as("_last_pay"))
    val spine = u.select((keys :+ "_shard").map(col): _*).distinct()
    val cw = Window.partitionBy(keys.map(col): _*).orderBy(col("_shard").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine.join(shardLast, keys :+ "_shard", "left")
      .withColumn("_carry_pay", last(col("_last_pay"), ignoreNulls = true).over(cw))
      .select((keys :+ "_shard").map(col) :+ col("_carry_pay"): _*)
    emit(
      within.join(carry, keys :+ "_shard", "left")
        .withColumn("_pay", coalesce(col("_pay"), col("_carry_pay"))),
      keys, leftTime, leftRest, rightPayload)
  }

  /** Forward variant: the EARLIEST right row with `right.time >=
    * left.time` (DuckDB: `ASOF LEFT JOIN … ON l.t <= r.t`). Encoded as
    * asofBackward over NEGATED epoch-micros — deliberately NOT a
    * [CURRENT ROW, UNBOUNDED FOLLOWING] frame, which Spark evaluates by
    * re-aggregating the remaining rows per input row (O(n²) per key
    * timeline); negation keeps the O(1)-per-row running frame. Among
    * right rows at the same timestamp the SMALLEST `tieBreak` wins (the
    * mirror of backward's largest). Time columns must be timestamps.
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightPayload: Seq[String], tieBreak: String): DataFrame = {
    val l = left
      .withColumn("_fwd_orig", col(leftTime))
      .withColumn("_fwd_t", -unix_micros(col(leftTime).cast("timestamp")))
      .drop(leftTime)
    val r = right
      .withColumn("_fwd_t", -unix_micros(col(rightTime).cast("timestamp")))
      .withColumn("_fwd_tb", -col(tieBreak).cast("long"))
    asofBackward(l, r, keys, "_fwd_t", "_fwd_t", rightPayload, "_fwd_tb")
      .drop("_fwd_t")
      .withColumnRenamed("_fwd_orig", leftTime)
  }
}

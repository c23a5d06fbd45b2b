package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * a key's timeline is processed as one sorted stream. Skew caveat: a
  * single hot key serializes into one reducer timeline; for known-hot keys
  * pre-split by coarse time range and stitch the boundary (same recipe as
  * sequence packing's caller-side sharding, curate/Curation.scala).
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

  /** @param rightPayload right columns to attach (must not collide with
    *                     left column names — alias on the right first)
    * @param tieBreak     right column (castable to long) ordering
    *                     equal-timestamp right rows; the largest wins
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   rightPayload: Seq[String], tieBreak: String): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTime)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side"),
          lit(null).cast("long").as("_tb")) ++
        leftRest.map(col) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightPayload.map(p => right.schema(p)))).as("_pay"): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side"),
          col(tieBreak).cast("long").as("_tb")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("_pay"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(keys.map(col) ++ Seq(col("_t").as(leftTime)) ++ leftRest.map(col) ++
        rightPayload.map(p => col(s"_pay.$p").as(p)): _*)
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

package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trailing-window range (interval) join — `probe ⋈ build ON key AND
  * build.t ∈ [probe.t − window, probe.t)` — without an inequality join.
  *
  * A naive range join plans BroadcastNestedLoopJoin (quadratic per key).
  * Instead both sides are bucketed into `window`-sized coarse time buckets:
  * every build row lands in exactly ONE bucket, and each probe row fans out
  * to the only TWO buckets its trailing window can overlap (b, b−1). The
  * join is then a plain equi-join on (key, bucket) — shuffle-partitionable,
  * AQE-skew-splittable, codegen'd — followed by the exact range predicate.
  * Because a build row has one bucket, a (probe, build) pair can match at
  * most once: no post-join dedup. Cost: 2× probe-side fan-out, ONE shuffle
  * each side. The same construction generalizes to any window width with
  * bucket = window (fan-out stays 2) — the standard interval-join layout
  * stream processors use for time-bounded joins.
  */
object RangeJoin {

  // TIMESTAMP_NTZ-tolerant epoch micros (session tz is pinned UTC
  // everywhere in this engine, so the cast is numerically a no-op).
  private def us(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Exact matched pairs (inner): probe columns + build columns.
    *
    * @param probeCols probe columns to carry (include the caller's keys)
    * @param buildCols build columns to attach (aliased, non-colliding)
    * @param windowUs  trailing window width in microseconds
    */
  def trailingWindowPairs(probe: DataFrame, build: DataFrame, key: String,
                          probeTime: String, buildTime: String,
                          probeCols: Seq[String], buildCols: Seq[String],
                          windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val p = probe.select(
      (probeCols.map(col) :+ col(key) :+
        us(col(probeTime)).as("_pt")): _*)
      .withColumn("_bkt",
        explode(array(floor(col("_pt") / windowUs),
          floor(col("_pt") / windowUs) - 1)))
    val b = build.select(
      (buildCols.map(col) :+ col(key).as("_bk") :+
        us(col(buildTime)).as("_bt")): _*)
      .withColumn("_bkt", floor(col("_bt") / windowUs))
    p.join(b,
        p("_bkt") === b("_bkt") && col(key) === col("_bk") &&
          col("_bt") >= col("_pt") - windowUs && col("_bt") < col("_pt"))
      .drop("_bkt", "_bk", "_bt", "_pt")
  }

  /** Per-probe-row aggregates over the trailing window, ZERO-FILLED: every
    * probe row appears exactly once even with no matches (inner pair join,
    * groupBy probe id, then join back to the probe side — the fan-out rows
    * never reach the caller). `aggs` must be null-safe-at-zero the caller
    * coalesces, e.g. count → coalesce(n, 0).
    */
  def trailingWindowAgg(probe: DataFrame, build: DataFrame, key: String,
                        probeTime: String, buildTime: String,
                        probeId: String, probeCols: Seq[String],
                        buildCols: Seq[String], windowUs: Long,
                        aggs: Seq[Column]): DataFrame = {
    val pairs = trailingWindowPairs(probe, build, key, probeTime, buildTime,
      Seq(probeId), buildCols, windowUs)
    val perProbe = pairs.groupBy(col(probeId)).agg(aggs.head, aggs.tail: _*)
    probe.select((probeId +: probeCols).distinct.map(col): _*)
      .join(perProbe, Seq(probeId), "left")
  }
}

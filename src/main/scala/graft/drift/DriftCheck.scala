package graft.drift

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift check: two-sample Kolmogorov–Smirnov + chi-square
  * over per-epoch histograms (SURVEY §2.3 T8; BASELINE.json:6 "distribution
  * drift on n_tok via two-sample KS/chi-square over per-partition histograms
  * merged with treeAggregate").
  *
  * Scale shape: the ONLY full-data pass is the histogram groupBy — a
  * partial+final hash aggregate whose key space is #epochs × #buckets
  * (tiny), i.e. exactly the associative merge a treeAggregate would do,
  * expressed Dataset-native so AQE/codegen apply. The KS/χ² statistics are
  * then plain column math over ≤ #buckets rows — a driver-safe frame.
  *
  * Bucketing uses fixed integer width (floor(value / width)), so histogram
  * counts are exact integers and deterministic under any partitioning.
  */
object DriftCheck {

  /** (epoch:int, bucket:int, cnt:long) — exact per-epoch histogram. */
  def histogram(df: DataFrame, valueCol: String, epochCol: String,
                bucketWidth: Long): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(
        col(epochCol).cast("int").as("epoch"),
        floor(col(valueCol).cast("double") / bucketWidth.toDouble).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** One row: (ks:double, chi2:double, n0:long, n1:long), statistics
    * rounded to 6 dp. Input must be a two-epoch histogram (epoch ∈ {0,1}).
    */
  def ksChi2(hist: DataFrame): DataFrame = {
    val perBucket = hist.groupBy(col("bucket")).agg(
      sum(when(col("epoch") === 0, col("cnt")).otherwise(0L)).as("c0"),
      sum(when(col("epoch") === 1, col("cnt")).otherwise(0L)).as("c1"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perBucket
      .withColumn("cum0", sum(col("c0")).over(w))
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("n0", sum(col("c0")).over(wAll))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("d", abs(col("cum0") / col("n0") - col("cum1") / col("n1")))
      .withColumn("e0", col("n0") * (col("c0") + col("c1")) / (col("n0") + col("n1")))
      .withColumn("e1", col("n1") * (col("c0") + col("c1")) / (col("n0") + col("n1")))
      .withColumn("term",
        when(col("e0") > 0, pow(col("c0") - col("e0"), 2) / col("e0")).otherwise(0.0) +
        when(col("e1") > 0, pow(col("c1") - col("e1"), 2) / col("e1")).otherwise(0.0))
      .agg(
        round(max(col("d")), 6).as("ks"),
        round(sum(col("term")), 6).as("chi2"),
        max(col("n0")).as("n0"),
        max(col("n1")).as("n1"))
  }

  /** Full drift pass: histogram + statistics. */
  def run(df: DataFrame, valueCol: String, epochCol: String, bucketWidth: Long): DataFrame =
    ksChi2(histogram(df, valueCol, epochCol, bucketWidth))

  /** 1-Wasserstein (earth-mover) distance between the two epochs' bucket
    * distributions — the drift statistic that, unlike KS, weighs HOW FAR
    * mass moved, not just the largest CDF gap.
    *
    * For a 1-D histogram, EMD = Σ_b |F0(b) − F1(b)| · width. To keep it
    * integer-exact (same value under any partitioning, any engine), the
    * summation runs on the common-denominator numerator
    * `Σ_b |cum0(b)·n1 − cum1(b)·n0|` in DECIMAL(38,0) — at 10^12 rows a
    * side the per-bucket product reaches ~10^24, far past int64, and
    * ANSI-mode Spark would (correctly) throw rather than wrap — and the
    * ONLY floating-point step is the final single division, which is
    * correctly rounded and therefore bit-identical in any IEEE engine.
    * Input/scale shape: same as ksChi2 — runs over the ≤ #buckets
    * histogram frame, never the data.
    */
  /** Population Stability Index between the two epochs' bucket
    * distributions — the monitoring-dashboard drift number (industry rule
    * of thumb: <0.1 stable, 0.1–0.25 moderate, >0.25 shifted). Unlike KS
    * (largest CDF gap) and EMD (mass transport), PSI is a per-bucket
    * symmetric KL sum, so it flags a reshaped distribution even when the
    * CDF crossings cancel.
    *
    * Empty buckets are Laplace-smoothed — p_e(b) = (c_e(b)+1)/(n_e+B) with
    * B the observed bucket count — so a bucket present in only one epoch
    * contributes a finite term instead of ±∞; the smoothing is exact
    * integer arithmetic until the final division, making the statistic
    * deterministic under any partitioning. Scale shape: same as ksChi2 —
    * all math runs over the ≤ #buckets histogram frame, never the data.
    *
    * Returns one row (psi:double rounded 6dp, n0:long, n1:long,
    * buckets:long).
    */
  def psi(hist: DataFrame): DataFrame = {
    val perBucket = hist.groupBy(col("bucket")).agg(
      sum(when(col("epoch") === 0, col("cnt")).otherwise(0L)).as("c0"),
      sum(when(col("epoch") === 1, col("cnt")).otherwise(0L)).as("c1"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perBucket
      .withColumn("n0", sum(col("c0")).over(wAll))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("nb", count(lit(1)).over(wAll))
      .withColumn("p0", (col("c0") + 1).cast("double") / (col("n0") + col("nb")))
      .withColumn("p1", (col("c1") + 1).cast("double") / (col("n1") + col("nb")))
      .agg(
        round(sum((col("p0") - col("p1")) * log(col("p0") / col("p1"))), 6).as("psi"),
        max(col("n0")).as("n0"),
        max(col("n1")).as("n1"),
        max(col("nb")).as("buckets"))
  }

  def emd(hist: DataFrame, bucketWidth: Long): DataFrame = {
    val perBucket = hist.groupBy(col("bucket")).agg(
      sum(when(col("epoch") === 0, col("cnt")).otherwise(0L)).as("c0"),
      sum(when(col("epoch") === 1, col("cnt")).otherwise(0L)).as("c1"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perBucket
      .withColumn("cum0", sum(col("c0")).over(w).cast("decimal(20,0)"))
      .withColumn("cum1", sum(col("c1")).over(w).cast("decimal(20,0)"))
      .withColumn("n0", sum(col("c0")).over(wAll).cast("decimal(20,0)"))
      .withColumn("n1", sum(col("c1")).over(wAll).cast("decimal(20,0)"))
      .withColumn("num", abs(col("cum0") * col("n1") - col("cum1") * col("n0")))
      .agg(
        sum(col("num")).cast("decimal(38,0)").as("emd_num"),
        max(col("n0")).cast("long").as("n0"),
        max(col("n1")).cast("long").as("n1"))
      // r4 VERDICT #1: the raw-double `round(num·w/(n0·n1), 6)` was the one
      // hash-FAIL in CORRECTNESS_r04 — DuckDB's round() on DOUBLE differs in
      // the last ulp from Spark's decimal-exact HALF_UP. Emit the statistic
      // integer-exactly instead (parts-per-million via the DECIMAL(38)+pmod
      // floor-division idiom already green in source_anomaly / drift_vocab)
      // and keep no engine-dependent double in the oracled frame.
      .withColumn("_x", col("emd_num") * lit(bucketWidth).cast("decimal(38,0)")
        * lit(1000000L).cast("decimal(38,0)"))
      .withColumn("_d", col("n0").cast("decimal(38,0)") * col("n1").cast("decimal(38,0)"))
      .select(col("emd_num"), col("n0"), col("n1"),
        when(col("_d") > 0,
          ((col("_x") - pmod(col("_x"), col("_d"))) / col("_d")).cast("long"))
          .as("emd_ppm"))
  }
}

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
}

package graft.report

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed result surface (BASELINE.json:15 "typed Dataset/DataFrame + Catalyst"):
  * the violation sink keyed (doc_id, constraint_id) and the per-partition
  * pass/fail summary (SURVEY §2.3 T4/T9/T11/T13) as case-class Datasets.
  */
final case class Violation(doc_id: String, constraint_id: String)

final case class PartitionSummary(
    partition_key: String, rows: Long, bad_rows: Long,
    violation_count: Long, pass: Boolean)

object ReportAssembler {

  /** (key, constraint_id) frame → Dataset[Violation]. */
  def violations(df: DataFrame, keyCol: String = "doc_id"): Dataset[Violation] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("doc_id"), col("constraint_id")).as[Violation]
  }

  /** Validator.summary frame → Dataset[PartitionSummary] (rollup total row
    * keyed "__total__").
    */
  def summaries(df: DataFrame, partitionCol: String): Dataset[PartitionSummary] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      coalesce(col(partitionCol).cast("string"), lit("__total__")).as("partition_key"),
      col("rows"), col("bad_rows"), col("violation_count"), col("pass"))
      .as[PartitionSummary]
  }

  /** Global top-k violation sampling (T11), planned as
    * TakeOrderedAndProject (no full sort at 10^12 rows).
    */
  def topViolations(v: Dataset[Violation], k: Int): Dataset[Violation] = {
    val spark = v.sparkSession
    import spark.implicits._
    v.orderBy(col("constraint_id"), col("doc_id").asc_nulls_first).limit(k).as[Violation]
  }

  /** k deterministic exemplar rows PER constraint (T11). row_number +
    * rank-filter plans as WindowGroupLimit in Spark 4: each map task keeps
    * only its local top-k per constraint before the shuffle, so the full
    * violation set is never sorted or collected per constraint partition.
    */
  def exemplarsPerConstraint(v: Dataset[Violation], k: Int): Dataset[Violation] = {
    val spark = v.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("constraint_id")).orderBy(col("doc_id").asc_nulls_first)
    v.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("doc_id"), col("constraint_id")).as[Violation]
  }

  /** Single verdict row: suite pass ⇔ zero violations anywhere. */
  def verdict(s: Dataset[PartitionSummary]): Boolean =
    s.filter(!col("pass")).isEmpty
}

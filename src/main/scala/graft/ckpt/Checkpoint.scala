package graft.ckpt

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpoint / resume (SURVEY §2.3 T12; BASELINE.json:6 "resumability from
  * an Iceberg checkpoint table carrying per-partition lineage and metrics").
  *
  * Model: work is partitioned by a string partition key (e.g. `source` or a
  * date). The checkpoint table is APPEND-ONLY — one row per completed
  * partition per run:
  *   (run_id, partition_key, status, metrics_json, lineage_json, updated_at)
  * Resume = read checkpoint, keep latest status per partition
  * (max-by updated_at), LEFT ANTI join the partition list against the DONE
  * set. Idempotence: re-processing an already-done partition appends a new
  * row; "latest wins" keeps the semantics exactly-once per partition.
  * The anti-join is a broadcast (checkpoint is tiny relative to data).
  */
object Checkpoint {

  val schema: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("partition_key", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("metrics_json", StringType, nullable = true),
    StructField("lineage_json", StringType, nullable = true),
    StructField("seq", LongType, nullable = false)
  ))

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Latest status per partition (monotonic `seq` breaks ties — wall clock
    * is banned for determinism; callers pass a run counter). `max` over a
    * (seq, status) struct orders lexicographically, so it IS max-by-seq —
    * and unlike `max_by` it hash-aggregates (max_by plans SortAggregate)
    * and breaks seq ties deterministically by status.
    */
  def latest(ckpt: DataFrame): DataFrame =
    ckpt.groupBy(col("partition_key"))
      .agg(max(struct(col("seq"), col("status"))).as("_m"))
      .select(col("partition_key"), col("_m.status").as("status"),
        col("_m.seq").as("seq"))

  /** Partitions still to process: all — latest(done). */
  def remaining(partitions: DataFrame, partitionKeyCol: String, ckpt: DataFrame): DataFrame = {
    val done = latest(ckpt).filter(col("status") === "done")
      .select(col("partition_key").as(partitionKeyCol))
    partitions.join(broadcast(done), Seq(partitionKeyCol), "left_anti")
  }

  /** Build checkpoint rows for a completed batch of partitions. */
  def completed(summaries: DataFrame, partitionKeyCol: String, runId: String,
                seq: Long): DataFrame =
    summaries.select(
      lit(runId).as("run_id"),
      col(partitionKeyCol).cast("string").as("partition_key"),
      lit("done").as("status"),
      to_json(struct(summaries.columns.filterNot(_ == partitionKeyCol).map(col): _*))
        .as("metrics_json"),
      to_json(struct(lit(runId).as("run"), input_file_name().as("input"))).as("lineage_json"),
      lit(seq).as("seq"))
}

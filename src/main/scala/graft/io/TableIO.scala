package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage seam (SURVEY §7.5). Production target is Iceberg
  * (BASELINE.json:14: metadata-driven partition pruning, snapshot reads);
  * the sandbox ships no Iceberg runtime jar, so the same call sites read
  * and write Parquet paths. The `format` is a plain string so flipping to
  * `"iceberg"` requires no compile-time Iceberg dependency.
  *
  * Design-for-scale notes baked into the writers:
  *  - violation/summary sinks partitionBy their natural pruning key;
  *  - appends are idempotent per (partition, run_id) — re-running a
  *    partition overwrites only its own directory (dynamic overwrite),
  *    which is the Parquet stand-in for Iceberg's overwrite-by-filter.
  */
final case class TableIO(spark: SparkSession, format: String = "parquet") {

  def read(path: String): DataFrame =
    spark.read.format(format).load(path)

  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
            mode: String = "overwrite"): Unit = {
    val w0 = df.write.format(format).mode(mode)
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    w.save(path)
  }

  /** Overwrite only the partitions present in `df` (Iceberg
    * overwrite-by-filter analogue; requires dynamic partitionOverwriteMode).
    */
  def overwritePartitions(df: DataFrame, path: String, partitionBy: Seq[String]): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.format(format).mode("overwrite").partitionBy(partitionBy: _*).save(path)
    finally prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }
}

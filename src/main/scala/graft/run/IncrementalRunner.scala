package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ckpt.Checkpoint
import graft.io.TableIO
import graft.schema.RecordSchema

/** Checkpointed, per-partition validation job (SURVEY §2.3 T12; north rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * Contract:
  *  - work is partitioned by a string partition key (e.g. `source`, a date);
  *  - each run validates ONLY partitions not marked done by the latest
  *    checkpoint row (latest-wins by monotonically increasing `seq`);
  *  - violation + summary sinks are written with dynamic partition
  *    overwrite — re-running a partition replaces exactly its own output
  *    (idempotence under retries; Parquet stand-in for Iceberg
  *    overwrite-by-filter);
  *  - the checkpoint table is APPEND-ONLY: one row per processed partition
  *    per run carrying metrics (rows/bad_rows/violation_count) and lineage
  *    (run id; at 10^12 scale, the snapshot/file-list of the input slice).
  *
  * Scale shape: the remaining-partition filter is a broadcast anti-join on
  * the partition key — the fact table is read once, pruned by
  * `partitionKey IN remaining` (partition pruning when the input is
  * partitioned by that key), and all passes run on the pruned slice.
  */
final case class RunResult(processedPartitions: Seq[String], violations: Long)

final case class IncrementalRunner(
    io: TableIO,
    schema: RecordSchema,
    keyCol: String,
    partitionCol: String,
    violationsPath: String,
    summaryPath: String,
    checkpointPath: String) {

  private def spark: SparkSession = io.spark

  private def readCheckpoint(): DataFrame = {
    val p = new java.io.File(checkpointPath)
    if (p.exists) io.read(checkpointPath) else Checkpoint.empty(spark)
  }

  /** Validate all not-yet-done partitions of `input`; returns what ran. */
  def run(input: DataFrame, dims: Map[String, DataFrame], runId: String): RunResult = {
    val ckpt = readCheckpoint()
    val parts = input.select(col(partitionCol)).distinct()
    // NULL partition keys would be conflated with the rollup total, NPE in
    // sorting, and escape isin() pruning (ADVICE r1) — reject them upfront;
    // callers must bucket nulls into an explicit partition value first.
    if (parts.filter(col(partitionCol).isNull).limit(1).count() > 0)
      sys.error(s"IncrementalRunner: NULL values in partition column '$partitionCol'; " +
        "bucket them into an explicit partition value before running")
    val remaining = Checkpoint.remaining(parts, partitionCol, ckpt)
      .collect().map(_.getString(0)).toSeq.sorted
    if (remaining.isEmpty) return RunResult(Nil, 0L)

    val slice = input.filter(col(partitionCol).isin(remaining: _*))
    // Row violations carry their partition directly (works for NULL keys);
    // table-level violations have non-null keys by construction, so the
    // partition re-attaches via a broadcast key→partition join.
    val rowV = graft.compile.ConstraintCompiler
      .violations(slice, schema.rowConstraints, Seq(partitionCol, keyCol))
    val tableV = schema.tableConstraints.flatMap {
      case u: graft.constraint.Unique =>
        // Uniqueness is a GLOBAL constraint: count over the FULL input
        // (column-pruned scan of just the key column — cheap even at
        // 10^12 rows), then attribute partitions by joining the slice's
        // (key, partition) pairs AGAINST the violation set. Restricting the
        // count to the slice would miss duplicates spanning a done
        // partition and a later-run partition (ADVICE r1, medium).
        // Join direction matters at scale (VERDICT r2 #2): the slice's
        // key→partition map is O(slice rows) — billions at 10^12 — and
        // must NEVER be the broadcast side; the violation set is
        // anomaly-sized but data-dependent, so no forced hint either: AQE
        // broadcasts it when its runtime size is small and degrades to a
        // disk-backed shuffle join when it is not. distinct() runs AFTER
        // the join, over the (tiny) violating subset only.
        val v = graft.unique.SaltedUniqueness.violations(input, u.column, u.id)
          .withColumnRenamed(u.column, keyCol)
        Some(slice.select(col(partitionCol), col(keyCol)).filter(col(keyCol).isNotNull)
          .join(v, Seq(keyCol))
          .distinct())
      case r: graft.constraint.RefIntegrity =>
        val dim = dims.getOrElse(r.dimTable, sys.error(s"dim '${r.dimTable}' missing"))
        Some(graft.ref.ReferentialCheck
          .violations(slice, r.column, dim, r.dimColumn, Seq(partitionCol, keyCol), r.id))
      case d: graft.constraint.Drift =>
        Some(graft.drift.DriftGate.violations(slice, d, partitionCol, keyCol))
      case _: graft.constraint.RowConstraint => None // runs in the row pass
      case other =>
        sys.error(s"IncrementalRunner: unhandled table constraint '${other.id}' — " +
          "declared constraints must never be silently dropped")
    }
    val violations = tableV.foldLeft(rowV)((a, b) =>
      a.unionByName(b.select(col(partitionCol), col(keyCol), col("constraint_id"))))
    val summary = Validator.summary(slice, schema, partitionCol)
      .filter(col(partitionCol).isNotNull) // rollup total is recomputed on read

    io.overwritePartitions(
      violations.select(col(partitionCol), col(keyCol), col("constraint_id")),
      violationsPath, Seq(partitionCol))
    io.overwritePartitions(summary, summaryPath, Seq(partitionCol))

    val seq = Checkpoint.latest(ckpt).agg(coalesce(max(col("seq")), lit(0L)))
      .head().getLong(0) + 1L
    val ckptRows = summary.select(
      lit(runId).as("run_id"),
      col(partitionCol).cast("string").as("partition_key"),
      lit("done").as("status"),
      to_json(struct(col("rows"), col("bad_rows"), col("violation_count"))).as("metrics_json"),
      to_json(struct(lit(runId).as("run"), lit(violationsPath).as("violations_sink"))).as("lineage_json"),
      lit(seq).as("seq"))
    io.write(ckptRows, checkpointPath, mode = "append")

    // an all-clean run leaves a footer-less empty sink that parquet can't
    // infer a schema from — that's 0 violations, not an error; any OTHER
    // read failure (corrupt files, bad path, permissions) must surface, not
    // masquerade as a clean result
    val v =
      try io.read(violationsPath).filter(col(partitionCol).isin(remaining: _*)).count()
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
               e.getMessage.contains("PATH_NOT_FOUND") => 0L
      }
    RunResult(remaining, v)
  }
}

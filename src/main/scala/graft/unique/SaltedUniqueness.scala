package graft.unique

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-uniqueness check with explicit skew handling (SURVEY §2.3 T6;
  * BASELINE.json:14 "uniqueness on doc_id via salted hash-aggregate with
  * explicit skew handling").
  *
  * Two-stage aggregation:
  *   stage 1: groupBy(key, salt).count  — salt = spark_partition_id(), so a
  *            hot key duplicated 10^6× across P input partitions contributes
  *            at most P rows to the shuffle instead of 10^6 hitting ONE
  *            reducer. (This makes Spark's map-side partial aggregation an
  *            explicit, guaranteed contract rather than an optimizer choice:
  *            even if partial agg were disabled or the input pre-shuffled by
  *            key, stage 1 bounds per-reducer fan-in.)
  *   stage 2: groupBy(key).sum(cnt) — reduces ≤P small rows per key.
  *
  * NULL keys are excluded: null-ness is the Required constraint's job
  * (one violation per cause — FIXTURES.md §3).
  */
object SaltedUniqueness {

  /** Duplicate keys with their total multiplicity (cnt > 1). */
  def duplicates(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(col(key), spark_partition_id().as("_salt"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(key))
      .agg(sum(col("_c")).as("cnt"))
      .filter(col("cnt") > 1)

  /** Violation rows keyed (key, constraint_id) — one per duplicate key. */
  def violations(df: DataFrame, key: String, constraintId: String): DataFrame =
    duplicates(df, key).select(col(key), lit(constraintId).as("constraint_id"))

  /** Reference implementation (unsalted) for property tests. */
  def naiveDuplicates(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull).groupBy(col(key))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)

  /** Hash-compaction variant for the mostly-unique regime (the expected
    * shape of a 10^12-row validation input): stage 1 aggregates over
    * `xxhash64(key)` instead of the key itself — 8-byte fixed-width grouping
    * keys hit the codegen'd fast hash map and shuffle ~3x fewer bytes than
    * 16+-char strings — then candidate hash groups (rare) are re-verified
    * EXACTLY on the true key via a broadcast semi-join + second aggregate,
    * so hash collisions can never produce a false duplicate.
    *
    * Same output contract as [[duplicates]]. Trade-off: assumes the dup-hash
    * set fits a broadcast (anomaly-sized); adversarial mostly-duplicate data
    * should use [[duplicates]], whose single shuffle is unconditional.
    * Measured on the bench suite: ~15-20%% faster at both 8 and 32 cores,
    * identical 8→32 scaling (both formulations are bound by the same
    * shuffle + hash-aggregate DRAM path — BENCH/BASELINE.md attribution).
    */
  def duplicatesHashCompacted(df: DataFrame, key: String): DataFrame = {
    val dupH = df.filter(col(key).isNotNull)
      .select(xxhash64(col(key)).as("_h"))
      .groupBy(col("_h"), spark_partition_id().as("_salt"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("_h")).agg(sum(col("_c")).as("_cnt")).filter(col("_cnt") > 1)
      .select("_h")
    df.filter(col(key).isNotNull)
      .join(broadcast(dupH), xxhash64(col(key)) === col("_h"), "left_semi")
      .groupBy(col(key)).agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
  }
}

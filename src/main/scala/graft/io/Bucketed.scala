package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) table layout — the shuffle-ELIMINATION story for
  * repeated large-large joins at 100 TB (SURVEY §2.2 hash/SMJ row;
  * `q_join_large` is the shuffle-per-query shape this amortizes away).
  *
  * Both sides are written once with `bucketBy(n, key).sortBy(key)`; Spark's
  * bucketed scan then reports the bucket spec as its output partitioning,
  * so a later equi-join on the bucket keys plans SortMergeJoin with NO
  * Exchange on either side — the per-query O(|data|) shuffle becomes a
  * one-time layout cost paid at ingest, amortized over every join on that
  * key (the Iceberg analogue is a bucket partition transform; this is the
  * sandbox's parquet stand-in, same seam as [[TableIO]]).
  *
  * Scale notes:
  *  - bucket count is a LAYOUT constant (both sides must agree, or differ
  *    by an integer ratio under spark.sql.bucketing.coalesceBucketsInJoin)
  *    — size it for the LARGER table's target file size at full scale,
  *    not the test corpus;
  *  - `sortBy(key)` makes each bucket file key-sorted, so the SMJ needs no
  *    per-task Sort either when one file per bucket is read;
  *  - bucketed tables must be saved through the catalog (`saveAsTable`) —
  *    the bucket spec lives in table metadata, not the files. The explicit
  *    `path` keeps the data external (no files under the session warehouse
  *    dir); the in-memory session catalog needs no Hive metastore.
  */
object Bucketed {

  /** Write `df` as a bucketed external table and return it re-read through
    * the catalog (only a catalog read carries the bucket spec). Idempotent
    * per session: an existing registered table is reused as-is.
    */
  def table(df: DataFrame, name: String, key: String, buckets: Int,
            path: String): DataFrame = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(name)) {
      df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    }
    spark.table(name)
  }

  /** Co-located equi-join of two same-bucket-count tables on their bucket
    * keys. The plan contract (asserted in PlanSpec) is ZERO shuffle
    * exchanges under the join.
    */
  def colocatedJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey))
}

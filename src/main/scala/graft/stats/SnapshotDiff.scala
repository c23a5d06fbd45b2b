package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff of two snapshots of the same keyed table — the data
  * regression test a pipeline runs between yesterday's and today's
  * output: what was added, what vanished, what changed in place.
  *
  * Scale shape: each side is first compacted to (key, xxhash64(payload))
  * — 16 bytes/row — so the full-outer join shuffles fingerprints, never
  * payloads, no matter how wide the table (at 100 TB this is the
  * difference between a 16 TB and a 100 TB shuffle). Classification is a
  * null/equality check on the joined hashes. A changed row escapes
  * detection only on an xxhash64 collision (2^-64 per row); the oracle
  * compares payloads directly, so the hash compaction itself is
  * hash-checked against true equality on the test corpus.
  */
object SnapshotDiff {

  /** (key, change) rows for every key whose presence or payload differs:
    * change ∈ 'added' (new only), 'removed' (old only), 'changed'.
    * Unchanged keys are filtered out — output is bounded by churn, not
    * table size.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           keyCol: String, payloadCols: Seq[String]): DataFrame = {
    def fp(df: DataFrame, h: String) =
      df.select(col(keyCol).as("key"),
        xxhash64(payloadCols.map(col): _*).as(h))
    fp(oldDf, "oh").join(fp(newDf, "nh"), Seq("key"), "full_outer")
      .select(col("key"),
        when(col("oh").isNull, lit("added"))
          .when(col("nh").isNull, lit("removed"))
          .when(col("oh") =!= col("nh"), lit("changed"))
          .otherwise(lit("unchanged")).as("change"))
      .filter(col("change") =!= lit("unchanged"))
  }
}

package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch CDC apply — the engine-side equivalent of a lakehouse
  * `MERGE INTO` (Iceberg/Delta): fold a change feed carrying
  * (key, op ∈ {I,U,D}, seq, payload…) into a snapshot.
  *
  * Semantics: per key, the change with the HIGHEST `seq` wins (the feed's
  * total order — ties within a key are rejected as ambiguous upstream
  * data, not silently resolved); `D` deletes the key, `I`/`U` upsert the
  * change's payload; keys with no change keep their snapshot row.
  *
  * Plan shape at 10^12-row snapshots:
  *  1. change COMPACTION first — one shuffle of the (small) feed only:
  *     row_number over (key ORDER BY seq DESC) keeps the latest change,
  *     so the expensive join sees ≤ one row per changed key;
  *  2. one full-outer equi-join snapshot ⋈ compacted on the key. With a
  *     broadcast-able compacted feed AQE plans it without shuffling the
  *     snapshot at all; with a bucketed snapshot layout (graft.io.Bucketed)
  *     the join co-locates with zero snapshot exchange even for huge
  *     feeds. The fold itself is pure column logic (no UDF).
  *
  * The incremental-run twin: ckpt.Checkpoint uses the same latest-wins
  * idea for run lineage; this operator applies it to the DATA.
  */
object MergeInto {

  /** @param payload snapshot payload columns; the change feed must carry
    *                the same names (its values win on I/U)
    * @param opCol   change column with values 'I' | 'U' | 'D'
    * @param seqCol  change-feed ordering column (castable to long);
    *                MUST be unique per key — the latest change wins
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, key: String,
                   opCol: String, seqCol: String,
                   payload: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).cast("long").desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .withColumn("_ties",
        count(lit(1)).over(Window.partitionBy(col(key), col(seqCol))))
      .filter(col("_rn") === 1)
      .select((key +: payload).map(c => col(c).as(s"_c_$c")) :+
        // ambiguous feed (two changes sharing (key, seq)) must fail loudly,
        // not pick an arbitrary winner. The guard lives INSIDE the op
        // column (which the fold always reads) so column pruning cannot
        // optimize the check away.
        when(col("_ties") === 1, col(opCol))
          .otherwise(raise_error(
            lit(s"MergeInto: duplicate $seqCol for a $key — feed order ambiguous")))
          .as(s"_c_$opCol"): _*)
    val joined = snapshot.join(latest,
      col(key) === col(s"_c_$key"), "full_outer")
    val hasChange = col(s"_c_$key").isNotNull
    val deleted = hasChange && col(s"_c_$opCol") === "D"
    joined
      .filter(!deleted)
      .select(
        coalesce(col(key), col(s"_c_$key")).as(key) +:
        payload.map(c =>
          when(hasChange, col(s"_c_$c")).otherwise(col(c)).as(c)): _*)
  }
}

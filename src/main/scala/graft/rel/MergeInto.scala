package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
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
  * Two plan shapes, same oracle-checked semantics:
  *  - `applyChanges` — change compaction (one shuffle of the feed only)
  *    then ONE full-outer equi-join. Spark cannot broadcast a full-outer
  *    hash join, so the snapshot side shuffles — UNLESS it lives in a
  *    bucketed layout on the key (graft.io.Bucketed), which co-locates
  *    the SortMergeJoin with zero snapshot exchange. The general shape
  *    for feeds of any size.
  *  - `applyChangesBroadcast` — for the common small-feed case: the
  *    full-outer decomposes into a broadcast LEFT join (keep/update/
  *    delete — zero snapshot shuffle) plus insert detection via a
  *    broadcast SEMI scan of the snapshot's matched keys. Two snapshot
  *    SCANS, ZERO snapshot shuffles: at 100 TB a second read is far
  *    cheaper than writing+reading the whole snapshot through a shuffle.
  *
  * The incremental-run twin: ckpt.Checkpoint uses the same latest-wins
  * idea for run lineage; this operator applies it to the DATA.
  */
object MergeInto {

  /** Latest change per key, payload renamed `_c_*`. Duplicate (key, seq)
    * raises through a guard INSIDE the op column (which the fold always
    * reads), so column pruning cannot optimize the check away.
    */
  private def compactLatest(changes: DataFrame, key: String, opCol: String,
                            seqCol: String, payload: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).cast("long").desc)
    changes
      .withColumn("_rn", row_number().over(w))
      .withColumn("_ties",
        count(lit(1)).over(Window.partitionBy(col(key), col(seqCol))))
      .filter(col("_rn") === 1)
      .select((key +: payload).map(c => col(c).as(s"_c_$c")) :+
        when(col("_ties") =!= 1,
          raise_error(
            lit(s"MergeInto: duplicate $seqCol for a $key — feed order ambiguous")))
          // an op code outside I/U/D must not silently behave as an upsert
          .when(!col(opCol).isin("I", "U", "D"),
            raise_error(concat(lit("MergeInto: unknown op '"), col(opCol), lit("'"))))
          .otherwise(col(opCol))
          .as(s"_c_$opCol"): _*)
  }

  private def foldColumns(key: String, opCol: String,
                          payload: Seq[String]): (Column, Seq[Column]) = {
    val hasChange = col(s"_c_$key").isNotNull
    val deleted = hasChange && col(s"_c_$opCol") === "D"
    val cols =
      coalesce(col(key), col(s"_c_$key")).as(key) +:
        payload.map(c => when(hasChange, col(s"_c_$c")).otherwise(col(c)).as(c))
    (deleted, cols)
  }

  /** General shape: one full-outer join (snapshot co-locates when bucketed
    * on the key; otherwise it shuffles once).
    *
    * @param payload snapshot payload columns; the change feed must carry
    *                the same names (its values win on I/U)
    * @param opCol   change column with values 'I' | 'U' | 'D'
    * @param seqCol  change-feed ordering column (castable to long);
    *                MUST be unique per key — the latest change wins
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, key: String,
                   opCol: String, seqCol: String,
                   payload: Seq[String]): DataFrame = {
    val latest = compactLatest(changes, key, opCol, seqCol, payload)
    val (deleted, cols) =
      foldColumns(key, opCol, payload)
    snapshot.join(latest, col(key) === col(s"_c_$key"), "full_outer")
      .filter(!deleted)
      .select(cols: _*)
  }

  /** Small-feed shape: zero snapshot shuffles (two snapshot scans).
    * Result is identical to applyChanges — RelSpec pins both equality and
    * the no-shuffle/no-SMJ plan.
    */
  def applyChangesBroadcast(snapshot: DataFrame, changes: DataFrame,
                            key: String, opCol: String, seqCol: String,
                            payload: Seq[String]): DataFrame = {
    val latest = compactLatest(changes, key, opCol, seqCol, payload)
    val (deleted, cols) = foldColumns(key, opCol, payload)
    // keep / update / delete: broadcast left join — snapshot never moves
    val folded = snapshot
      .join(broadcast(latest), col(key) === col(s"_c_$key"), "left")
      .filter(!deleted)
      .select(cols: _*)
    // inserts: feed keys NOT present in the snapshot. Membership comes
    // from a broadcast SEMI scan (output ≤ |feed| rows), not a shuffle.
    val matched = snapshot.select(col(key))
      .join(broadcast(latest.select(col(s"_c_$key"))),
        col(key) === col(s"_c_$key"), "left_semi")
    val inserts = latest
      .filter(col(s"_c_$opCol") =!= "D")
      .join(broadcast(matched), col(s"_c_$key") === col(key), "left_anti")
      .select((key +: payload).map(c => col(s"_c_$c").as(c)): _*)
    folded.unionByName(inserts)
  }
}

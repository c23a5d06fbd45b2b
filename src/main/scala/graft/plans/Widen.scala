package graft.plans

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan widening (optimization guide §2.5, "input skew: one
  * huge unsplittable file … repartition immediately after the read").
  *
  * The fixture tables are single parquet files with one row group, so a
  * scan plans 1 split and every compute-heavy projection above it
  * (shingling, token-gram hashing, signature loops) runs on 1–2 of the 32
  * cores — measured r6: span_trim's occurrence stage was a 7.1 s
  * SINGLE-task stage; the dedup shingle-index build ran 1.9 s on 2 tasks.
  * Inserting one round-robin repartition to the session's default
  * parallelism BETWEEN the scan and the heavy projection spreads that
  * work over every core for the cost of shuffling the raw rows once.
  *
  * The gate is data-derived, not a local[32] constant: the repartition is
  * inserted ONLY when the frame's planned parallelism is below the
  * session's core count. At production scale a 100 TB table scans as
  * O(10^5–10^6) splits, the gate is false, and this is the identity —
  * the same measure-then-plan pattern as ReferentialCheck.smallDimSet
  * (and the remedy the guide prescribes for the one-giant-gzip case,
  * where it fires correctly).
  *
  * Callers must only pass exchange-free frames (scan/filter/project/union
  * shapes): partition inspection plans the frame, and results must be
  * partitioning-independent (every engine operator is — content-keyed
  * aggregates, joins, and total-order outputs).
  */
object Widen {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val planned = df.queryExecution.toRdd.getNumPartitions
    if (planned < target) df.repartition(target) else df
  }
}

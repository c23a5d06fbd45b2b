package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs on
  * top of dedup/similarity: deterministic stratified sampling, sequence
  * packing into fixed context-window budgets, and corpus-level token
  * frequency. All pure Catalyst columns — no UDFs, no driver-side state —
  * and each with an exactly-mirrorable ANSI-SQL twin (graft.OracleSql).
  */
object Curation {

  /** Deterministic per-row sampling hash in [0, 1000) — permille bucket.
    *
    * Pure modular arithmetic instead of xxhash64 so the DuckDB oracle can
    * mirror it bit-for-bit; the inner `% 1000003` keeps the product below
    * 2^63 for ANY int64 id (1000003 * 2654435761 < 2^62), so the formula is
    * overflow-safe at 10^12 rows in both engines. Production would swap in
    * xxhash64(id) — same plan shape, one codegen'd expression either way.
    */
  def sampleBucket(id: Column): Column =
    pmod((id % 1000003L) * 2654435761L + 12345L, lit(1000L))

  /** Stratified downsampling by a key column with per-key permille rates:
    * the classic per-language / per-domain curation mix (e.g. cap English
    * at 25%, keep low-resource languages whole). `rates` is a small dim
    * (key, permille) — broadcast-joined, so the fact side never shuffles;
    * keys absent from `rates` default to `defaultPermille`.
    *
    * Deterministic in the row's own id — re-running the pipeline (or
    * resuming half-way) selects the SAME sample, which is what makes the
    * operator usable in an incremental/resumable run (ckpt/Checkpoint).
    */
  def sampleStratified(df: DataFrame, idCol: String, keyCol: String,
                       rates: DataFrame, defaultPermille: Long = 1000L): DataFrame =
    df.join(broadcast(rates), df(keyCol) === rates("key"), "left")
      .filter(sampleBucket(col(idCol)) <
        coalesce(col("permille"), lit(defaultPermille)))
      .drop("key", "permille")

  /** Pack variable-length documents into fixed token-budget bins (context
    * windows) — the "sample packing" step before LLM pretraining.
    *
    * Semantics: within each (shard key) stream, documents in id order are
    * laid end-to-end; a document whose EXCLUSIVE prefix sum has consumed k
    * full budgets starts in bin k (boundary docs overflow their bin — the
    * contiguous-stream packing used when documents may straddle windows).
    * One window aggregate = one shuffle on the shard key.
    *
    * Scale shape: a naive `partitionBy(source)` window puts an entire
    * source on one reducer — a skew wall when one domain dominates the
    * corpus. The caller-supplied shard column (e.g. `pmod(doc_id, nShards)`)
    * bounds every window partition, at the cost of nShards independent
    * packing streams per source — the standard trade, since bins only need
    * to be dense WITHIN a stream, not globally sequential.
    */
  def packSequences(df: DataFrame, idCol: String, tokCol: String,
                    shardCols: Seq[Column], budget: Long): DataFrame = {
    val w = Window.partitionBy(shardCols: _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_prev", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("_prev") / lit(budget.toDouble)).cast("long"))
      .withColumn("bin_offset", col("_prev") % budget)
      .drop("_prev")
  }

  /** Corpus-level token frequency, top-k: the wordcount shape — explode is
    * row-explosive but the partial (map-side) aggregate collapses each
    * partition to its distinct tokens before the single shuffle, and top-k
    * is TakeOrdered (per-partition heads, never a global sort). Ties broken
    * by token for a deterministic boundary.
    */
  def tokenTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)
}

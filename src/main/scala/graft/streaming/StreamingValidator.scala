package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.compile.ConstraintCompiler
import graft.schema.RecordSchema

/** Structured-Streaming face of the engine.
  *
  * The reference has no streaming surface (SURVEY §2.2: absent in
  * pyschema); the engine gets one for free because every built-in
  * constraint compiles to a PURE Column expression (§2.4): the exact same
  * predicates attach to a `readStream` plan unchanged. Stateful pieces
  * (uniqueness) are windowed — global uniqueness over an unbounded stream
  * is unbounded state; the contract here is uniqueness WITHIN the
  * watermarked event-time window, which is the deployable semantics.
  */
object StreamingValidator {

  /** Per-record violation stream: (keyCol, constraint_id). Append-mode safe
    * (stateless projection).
    */
  def violations(stream: DataFrame, schema: RecordSchema, keyCol: String): DataFrame =
    ConstraintCompiler.violations(stream, schema.rowConstraints, Seq(keyCol))

  /** Windowed violation counts with watermarked late-data handling. */
  def windowedViolationCounts(stream: DataFrame, schema: RecordSchema,
                              tsCol: String, watermark: String,
                              windowLen: String): DataFrame =
    ConstraintCompiler.withCounts(stream, schema.rowConstraints)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(
        count(lit(1)).as("rows"),
        sum(col(ConstraintCompiler.VCountCol).cast("long")).as("violation_count"))

  /** Duplicate keys within a watermarked window (streaming uniqueness). */
  def windowedDuplicates(stream: DataFrame, keyCol: String, tsCol: String,
                         watermark: String, windowLen: String): DataFrame =
    stream.filter(col(keyCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Streaming exact dedup, keep-first: pass each content hash through once
    * and drop re-arrivals inside the watermark horizon
    * (`dropDuplicatesWithinWatermark` — per-key state EXPIRES with the
    * watermark, so state size is rate × horizon, not corpus size; plain
    * streaming `dropDuplicates` would grow without bound). The batch twin
    * is Dedup.exact's keep-first exemplar; a re-arrival later than the
    * horizon is admitted again — the documented, bounded-state contract.
    */
  def dedupedWithinWatermark(stream: DataFrame, contentCol: String,
                             tsCol: String, watermark: String): DataFrame =
    stream.withColumn("_h", md5(col(contentCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_h")
      .drop("_h")

  /** Ingestion-time decontamination screen: each arriving doc's word
    * n-grams probe the offline-fitted eval Bloom filter (the same
    * `BloomMightContain` expression as batch `contaminationHitsBloom`) —
    * a STATELESS projection, so it needs no watermark, no state store,
    * and adds zero shuffle to the ingest plan. Emits flagged docs with
    * their candidate-gram count. One-sided error: a doc with NO flagged
    * gram is definitively clean (safe to admit); flagged docs carry Bloom
    * false positives by design and go to the exact verify — downstream a
    * stream-static join against the real eval-gram set (stateless per
    * micro-batch), or the batch path on the quarantine table.
    */
  def contaminationScreen(stream: DataFrame, textCol: String, idCol: String,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      n: Int = 3): DataFrame = {
    import graft.functions.hashExprs.{bloom_might_contain, word_shingles}
    import graft.text.TextAnalysis.words
    stream.select(col(idCol).as("doc_id"),
        size(filter(word_shingles(words(col(textCol)), n),
          g => bloom_might_contain(xxhash64(g), bloom))).as("cand_ngrams"))
      .filter(col("cand_ngrams") > 0)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 has a `queries` entry; every
  * SQL-expressible one has a DuckDB twin in `oracleSql` (column names and
  * types aligned on both sides — the driver sorts columns by name and
  * hashes values). The LSH family is hash-checked too: pair pipelines
  * against ALL-PAIRS exact ground truth (band recall included), ANN against
  * a full SQL mirror of the bucketing. Only col_stats_sketch (HLL/KLL
  * sketches, approximate by construction) stays rows-only.
  */
object SparkEntry {

  /** Flagship: full constraint suite (row + uniqueness + referential +
    * drift gate) over the planted-violation token table at sf0.001 →
    * violation rows. Driver smoke-checks rows > 0 (the plant guarantees 72
    * violations at sf0.001: uniqueness emits one row per duplicate KEY).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.flagshipViolations(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // core validation engine (SURVEY §2.3 T1–T13)
    "seq_synth" -> (Queries.seqSynth _),
    "row_violations" -> (Queries.rowViolations _),
    "doc_violations" -> (Queries.docViolations _),
    "unique_dups" -> (Queries.uniqueDups _),
    "ref_violations" -> (Queries.refViolations _),
    "fd_audit" -> (Queries.fdAudit _),
    "token_equality" -> (Queries.tokenEquality _),
    "col_stats" -> (Queries.colStats _),
    "col_stats_sketch" -> (Queries.colStatsSketch _),
    "constraint_suggest" -> (Queries.constraintSuggest _),
    "partition_summary" -> (Queries.partitionSummary _),
    "drift_hist" -> (Queries.driftHist _),
    "drift_stats" -> (Queries.driftStats _),
    "drift_gate" -> (Queries.driftGate _),
    "drift_emd" -> (Queries.driftEmd _),
    "drift_psi" -> (Queries.driftPsi _),
    "drift_vocab" -> (Queries.driftVocab _),
    "drift_vocab_top" -> (Queries.driftVocabTop _),
    "source_anomaly" -> (Queries.sourceAnomaly _),
    "violation_examples" -> (Queries.violationExamples _),
    "hist_udaf" -> (Queries.histUdaf _),
    "custom_validator" -> (Queries.customValidator _),
    "cond_violations" -> (Queries.condViolations _),
    "order_audit" -> (Queries.orderAudit _),
    "events_drift" -> (Queries.eventsDrift _),
    "json_roundtrip" -> (Queries.jsonRoundtrip _),
    "avro_roundtrip" -> (Queries.avroRoundtrip _),
    "schema_dispatch" -> (Queries.schemaDispatch _),
    "ckpt_resume" -> (Queries.ckptResume _),
    // relational breadth
    "q1_agg" -> (Queries.q1Agg _),
    "q_filter_pushdown" -> (Queries.qFilterPushdown _),
    "q_join_agg" -> (Queries.qJoinAgg _),
    "q_join_large" -> (Queries.qJoinLarge _),
    "q_join_bucketed" -> (Queries.qJoinBucketed _),
    "q_topk" -> (Queries.qTopK _),
    "q_window" -> (Queries.qWindow _),
    "q_setops" -> (Queries.qSetOps _),
    "q_map_ops" -> (Queries.qMapOps _),
    "q_cube" -> (Queries.qCube _),
    "q_asof_join" -> (Queries.qAsofJoin _),
    "q_asof_fwd" -> (Queries.qAsofFwd _),
    "q_range_join" -> (Queries.qRangeJoin _),
    "events_sessionize" -> (Queries.eventsSessionize _),
    "merge_apply" -> (Queries.mergeApply _),
    // training-data pipeline operators
    "dedup_exact" -> (Queries.dedupExact _),
    "dedup_exemplars" -> (Queries.dedupExemplars _),
    "dedup_ngram_jaccard" -> (Queries.dedupNgramJaccard _),
    "dedup_minhash_lsh" -> (Queries.dedupMinhashLsh _),
    "dedup_containment" -> (Queries.dedupContainment _),
    "dedup_span" -> (Queries.dedupSpan _),
    "span_hot" -> (Queries.spanHot _),
    "span_trim" -> (Queries.spanTrim _),
    "decontam_span" -> (Queries.decontamSpan _),
    "lsh_screen" -> (Queries.lshScreen _),
    "url_canon" -> (Queries.urlCanon _),
    "key_skew" -> (Queries.keySkewAudit _),
    "join_salted" -> (Queries.joinSalted _),
    "snapshot_diff" -> (Queries.snapshotDiff _),
    "seq_chunk" -> (Queries.seqChunk _),
    "dedup_norm" -> (Queries.dedupNormalized _),
    "dedup_simhash" -> (Queries.dedupSimhash _),
    "dedup_embedding" -> (Queries.dedupEmbedding _),
    "dedup_embedding_capped" -> (Queries.dedupEmbeddingCapped _),
    "dedup_lines" -> (Queries.dedupLines _),
    "dedup_groups" -> (Queries.dedupGroups _),
    "dedup_keep_best" -> (Queries.dedupKeepBest _),
    "split_safe" -> (Queries.splitSafe _),
    "effective_size" -> (Queries.effectiveSize _),
    "split_leak_audit" -> (Queries.splitLeakAudit _),
    "vocab_coverage" -> (Queries.vocabCoverage _),
    "sim_topk" -> (Queries.simTopK _),
    "sim_topk_quant" -> (Queries.simTopKQuant _),
    "sim_ann_lsh" -> (Queries.simAnnLsh _),
    "sim_ann_ivf" -> (Queries.simAnnIvf _),
    "ivf_fit" -> (Queries.ivfFit _),
    "emb_quantize" -> (Queries.embQuantize _),
    "emb_audit" -> (Queries.embAudit _),
    "sample_stratified" -> (Queries.sampleStratified _),
    "mix_sample" -> (Queries.mixSample _),
    "sample_cap_per_key" -> (Queries.sampleCapPerKey _),
    "seq_pack" -> (Queries.seqPack _),
    "len_buckets" -> (Queries.lenBuckets _),
    "shard_plan" -> (Queries.shardPlan _),
    "tok_topfreq" -> (Queries.tokTopFreq _),
    "lm_oov" -> (Queries.lmOov _),
    "decontaminate" -> (Queries.decontaminate _),
    "decontam_bloom" -> (Queries.decontamBloom _),
    "decontam_emb" -> (Queries.decontamEmb _),
    "doc_repetition" -> (Queries.docRepetition _),
    "curation_gate" -> (Queries.curationGate _),
    "text_redact" -> (Queries.textRedact _),
    "text_tokens" -> (Queries.textTokens _),
    "text_tfidf" -> (Queries.textTfidf _),
    "text_quality" -> (Queries.textQuality _),
    "text_lang_id" -> (Queries.textLangId _),
    "text_fingerprint" -> (Queries.textFingerprint _),
    "ngram_fluency" -> (Queries.ngramFluency _),
    "ngram_novelty" -> (Queries.ngramNovelty _),
    "source_overlap" -> (Queries.sourceOverlap _),
    "multimodal_meta" -> (Queries.multimodalMeta _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sketches, LSH) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = OracleSql.all
}

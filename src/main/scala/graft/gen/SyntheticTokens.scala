package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.exprs.token_array_gen

/** Deterministic tokenized-sequence synthesis (FIXTURES.md §1).
  *
  * Derives the authoritative input shape of BASELINE.json:15 —
  * `(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)` —
  * from the driver-provided `documents.parquet` via PURE integer column
  * arithmetic (no RNG, no hash builtins), chosen so the exact same formula
  * is expressible in ANSI SQL for the DuckDB oracle (see
  * [[graft.OracleSql]]). Seeded by doc_id alone ⇒ permutation/partition
  * invariant and stable across engines.
  *
  * Formulas (all operands stay far below 2^63 — doc_id ≤ ~10^7, so
  * doc_id * 2654435761 ≤ 2.7e16; no overflow in either engine):
  *   n_tok     = 1 + (doc_id*40503 + 17) % 512                ∈ [1, 512]
  *   tokens[i] = (doc_id*2654435761 + i*97003 + 7) % 32768    ∈ [0, VOCAB)
  *
  * The `dirty` variant plants one violation class per doc_id%50 bucket
  * (closed-form expected violation set — FIXTURES.md §1 "planted-violation
  * variant"):
  *   cls 1: doc_id := NULL                  → required_doc_id
  *   cls 2: doc_id := doc-…999000 (10 dups) → unique_doc_id
  *   cls 3: source := "__unknown__"         → ref_integrity_source
  *   cls 4: n_tok := 9999                   → range_n_tok + size_consistent
  *   cls 5: n_tok := 0                      → range_n_tok + size_consistent
  *   cls 6: tokens[0] := -1                 → array_elem_tokens (+ token-equality mismatch)
  *   cls 7: doc_id := doc-…999007 (10 dups) → unique_doc_id (hot key)
  */
object SyntheticTokens {

  val Vocab = 32768L
  val NTokMod = 512L
  val MaxTok = 8192L
  val TokA = 2654435761L
  val TokB = 97003L
  val TokC = 7L
  val NA = 40503L
  val NB = 17L
  val ClassMod = 50L
  val DupBase = 999000L
  val HotBase = 999007L

  // concat+lpad, not format_string: java.util.Formatter costs ~2x per row
  // (tools/IdGenProbe), and doc_id is generated in every suite branch
  private def docIdStr(c: Column): Column =
    concat(lit("doc-"), lpad(c.cast("string"), 12, "0"))

  private def nTok0(orig: Column): Column =
    (lit(1L) + pmod(orig * NA + NB, lit(NTokMod))).cast("int")

  private def tokenAt(orig: Column, i: Column): Column =
    pmod(orig * TokA + i * TokB + TokC, lit(Vocab)).cast("int")

  /** Codegen'd token generator (graft.functions.TokenArrayGen) — identical
    * element values to transform(sequence(0, n-1), i => tokenAt(orig, i)),
    * ~100x faster (tight primitive loop inside whole-stage codegen).
    */
  private def tokensOf(orig: Column, nTok: Column): Column =
    token_array_gen(orig, nTok, TokA, TokB, TokC, Vocab)

  /** Clean sequences from a documents frame (doc_id:int64, source:string).
    * Keeps `orig` (the integer id) for test bookkeeping; engine passes
    * ignore it.
    */
  def clean(documents: DataFrame): DataFrame = {
    val orig = col("orig")
    documents
      .select(col("doc_id").as("orig"), col("source"))
      .select(
        docIdStr(orig).as("doc_id"),
        tokensOf(orig, nTok0(orig)).as("tokens"),
        nTok0(orig).as("n_tok"),
        col("source"),
        orig,
        pmod(orig, lit(2L)).cast("int").as("epoch"))
  }

  /** Planted-violation variant (same shape + `orig`). */
  def dirty(documents: DataFrame): DataFrame = {
    val orig = col("orig")
    val cls = col("cls")
    documents
      .select(col("doc_id").as("orig"), pmod(col("doc_id"), lit(ClassMod)).as("cls"),
        col("source"))
      .select(
        when(cls === 1, lit(null).cast("string"))
          .when(cls === 2, docIdStr(lit(DupBase)))
          .when(cls === 7, docIdStr(lit(HotBase)))
          .otherwise(docIdStr(orig)).as("doc_id"),
        when(cls === 6,
          concat(array(lit(-1).cast("int")),
            slice(tokensOf(orig, nTok0(orig)), lit(2), nTok0(orig) - 1)))
          .otherwise(tokensOf(orig, nTok0(orig)))
          .as("tokens"),
        when(cls === 4, lit(9999).cast("int"))
          .when(cls === 5, lit(0).cast("int"))
          .otherwise(nTok0(orig)).as("n_tok"),
        when(cls === 3, lit("__unknown__")).otherwise(col("source")).as("source"),
        orig,
        pmod(orig, lit(2L)).cast("int").as("epoch"))
  }

  // Planted duplicated-span variant (dedup_span / span_hot / span_trim):
  // classes and geometry of the shared token block. Docs in cls ∈
  // {11,12,13} with n_tok ≥ SpanMinLen get positions
  // [SpanPrefix+1, SpanPrefix+SpanLen] overwritten with a doc-INDEPENDENT
  // block c_i = (i*SpanA + SpanB) % Vocab.
  //
  // The span corpus uses a VARIABLE-STEP stream, not the clean generator:
  // clean tokens advance by the same 97003 % 2^15 every position in every
  // doc, so any two docs align under a shift and cross-doc k-gram
  // duplication saturates the corpus (measured: 1.24M of 1.25M
  // occurrences "duplicated" at sf0.1 — a dup-dominated fixture no real
  // corpus resembles). Here the step is 97003 + 13*orig: distinct per doc
  // below 2^15 docs (13 is odd ⟹ invertible mod 2^15), and two consecutive
  // tokens determine the step, so two documents can share an 8-gram ONLY
  // via the planted block — duplication in this fixture is exactly the
  // plant, the realistic sparse regime the operators' scale shapes assume.
  val SpanClasses = Seq(11L, 12L, 13L)
  val SpanMinLen = 64L
  val SpanPrefix = 16
  val SpanLen = 32
  val SpanA = 1009L
  val SpanB = 13L
  val SpanVarStep = 13L

  /** Planted-span sequences (same shape + `orig`). Pure column
    * arithmetic, mirrored formula-for-formula by the DuckDB oracle
    * (OracleSql `sp` CTE). All intermediates stay far below 2^63
    * (i ≤ 511, step ≤ 97003 + 13·orig with orig ≤ ~10^7).
    */
  def spanned(documents: DataFrame): DataFrame = {
    val orig = col("orig")
    val nTok = nTok0(orig)
    val varTokens =
      graft.functions.exprs.var_step_token_gen(
        orig, nTok, TokA, TokB, SpanVarStep, TokC, Vocab)
    val common = expr(
      s"transform(sequence(0, ${SpanLen - 1}), i -> CAST((i * $SpanA + $SpanB) % $Vocab AS INT))")
    documents
      .select(col("doc_id").as("orig"), col("source"))
      .select(
        docIdStr(orig).as("doc_id"),
        when(pmod(orig, lit(ClassMod)).isin(SpanClasses: _*) &&
          nTok >= SpanMinLen,
          concat(
            slice(varTokens, 1, SpanPrefix),
            common,
            slice(varTokens, lit(SpanPrefix + SpanLen + 1),
              nTok - (SpanPrefix + SpanLen))))
          .otherwise(varTokens).as("tokens"),
        nTok.as("n_tok"),
        col("source"),
        orig)
  }

  def spannedFrom(spark: SparkSession, sfDir: String): DataFrame =
    // widen between the (single-file) scan and the token-generation
    // expressions so var_step_token_gen + downstream gram hashing run on
    // every core (r6: the span family's occurrence stage was single-task)
    spanned(graft.plans.Widen(
      readDocuments(spark, sfDir).select(col("doc_id"), col("source"))))

  /** Sources dimension (broadcast side of the referential check):
    * distinct sources of the CLEAN documents + a deterministic weight.
    */
  def sourcesDim(documents: DataFrame): DataFrame =
    documents.select(col("source")).distinct()
      .withColumn("weight",
        (pmod(length(col("source")) * 31 + ascii(substring(col("source"), -1, 1)), lit(100L)) / 100.0))

  def readDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  def cleanFrom(spark: SparkSession, sfDir: String): DataFrame =
    clean(readDocuments(spark, sfDir))

  def dirtyFrom(spark: SparkSession, sfDir: String): DataFrame =
    dirty(readDocuments(spark, sfDir))

  /** Purely synthetic sequences at arbitrary row count (bench headline:
    * ≥10^7 rows, BASELINE.md) — same formulas over spark.range, so the
    * validation suite exercises identical expressions at any scale.
    * `numPartitions` is pinned by the caller so local[8] and local[32]
    * process identical splits (scaling-efficiency protocol).
    */
  def synthetic(spark: SparkSession, rows: Long, numPartitions: Int,
                nTokMod: Long = NTokMod): DataFrame = {
    val orig = col("id")
    val nTok = (lit(1L) + pmod(orig * NA + NB, lit(nTokMod))).cast("int")
    spark.range(0L, rows, 1L, numPartitions)
      .select(
        docIdStr(orig).as("doc_id"),
        tokensOf(orig, nTok).as("tokens"),
        nTok.as("n_tok"),
        concat(lit("src"), pmod(orig, lit(20L)).cast("string")).as("source"),
        orig,
        pmod(orig, lit(2L)).cast("int").as("epoch"))
  }
}

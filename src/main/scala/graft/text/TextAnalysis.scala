package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for training-data pipelines: token
  * counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure Catalyst columns (codegen'd, no UDFs), all
  * ANSI-safe (modular arithmetic keeps every intermediate < 2^63), and all
  * mirrored 1:1 by ANSI SQL in [[graft.OracleSql]] so the DuckDB oracle
  * checks them exactly.
  */
object TextAnalysis {

  val FpMod = 1000000007L
  val FpMul = 1000003L

  /** Whitespace-token words. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  def wordCount(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish sub-word token estimate: letter runs, single digits, and
    * single non-alnum marks — the GPT-2-style pre-tokenizer shape, kept to
    * constructs whose Java-regex and RE2 semantics coincide so the oracle
    * mirrors it exactly.
    */
  val BpeTokenRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpeTokenRe)).cast("long")

  /** Polynomial rolling-hash fingerprint over words (order-sensitive,
    * locality-free exact-dup key that never materializes the text).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(words(text),
        w => ((length(w) * 131 + ascii(substring(w, 1, 1))) % FpMod).cast("long")),
      lit(0L),
      (acc, x) => (acc * FpMul + x) % FpMod)

  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,!?]", "")).cast("long")

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(words(text), w => w.isin(stopwords: _*))).cast("long")

  /** Integer quality bucket from simple surface statistics. */
  def qualityBucket(wordsC: Column, stops: Column, punct: Column): Column =
    when(wordsC >= 50 && stops > 0, lit(2L))
      .when(wordsC >= 20, lit(1L))
      .otherwise(lit(0L))

  /** Marker-word language-ID heuristic (n-gram/stopword counting — the
    * container has no language-ID model; the heuristic itself is the
    * deterministic, oracle-checkable pipeline stage).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "que"),
    "fr" -> Seq("le", "les", "est"))

  def markerCountOfWords(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isin(markers: _*))).cast("long")

  def markerCount(text: Column, markers: Seq[String]): Column =
    markerCountOfWords(words(text), markers)

  /** Callers should pass a MATERIALIZED words column (one split per row);
    * passing words(text) directly inlines the split into every marker set.
    */
  def predictedLangOfWords(ws: Column): Column = {
    val counts = LangMarkers.map { case (l, ms) => l -> markerCountOfWords(ws, ms) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und")) { case ((l, c), els) =>
      when(c > 0 && c === best, lit(l)).otherwise(els)
    }
  }

  def predictedLang(text: Column): Column = predictedLangOfWords(words(text))
}

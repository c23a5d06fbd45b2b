package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level word-n-gram statistics for training-data curation:
  * common-bigram fluency, first-occurrence novelty, and pairwise
  * inter-source overlap. All three are the "stats-then-apply" family
  * (like TF-IDF and the curation gate): one exploded-gram aggregate
  * builds corpus statistics, a second pass scores rows against them —
  * two corpus scans by construction, each a single gram-keyed shuffle.
  *
  * Everything is exact integer arithmetic plus one final correctly-rounded
  * double division (the `floor(1000*a/b)` permille idiom used across the
  * engine) — no libm logs, no float accumulation — so every output is
  * bit-identical at any parallelism and a DuckDB oracle can mirror each
  * pipeline formula-for-formula ([[graft.OracleSql]]).
  *
  * Tokenization is the engine's whitespace word split
  * ([[TextAnalysis.words]]), whose Java-regex and RE2/DuckDB semantics
  * coincide.
  */
object NgramStats {

  private def ws(textCol: String) = split(trim(col(textCol)), "\\s+").as("_ws")

  /** Word bigrams as (u, v) columns, one row per OCCURRENCE (multiplicity
    * kept — a set-difference would undercount repeated grams, same
    * reasoning as [[graft.curate.Curation.oovScore]]). A doc with fewer
    * than 2 words contributes nothing here; callers re-attach such docs
    * with a left join so they surface with zero counts instead of
    * vanishing from a quality report.
    */
  private def bigrams(docs: DataFrame, keyCol: String, textCol: String): DataFrame =
    docs.select(col(keyCol), ws(textCol))
      .select(col(keyCol), explode(expr(
        "transform(slice(_ws, 1, greatest(size(_ws) - 1, 0)), " +
          "(u, i) -> struct(u AS u, element_at(_ws, i + 2) AS v))")).as("_b"))
      .select(col(keyCol), col("_b.u").as("u"), col("_b.v").as("v"))

  /** Per-document common-bigram fluency — the n-gram-LM quality signal
    * without the log: a document whose word bigrams are mostly rare in the
    * corpus is boilerplate, shuffled text, or the wrong domain, exactly
    * what a perplexity filter flags, but expressed in exact integers (a
    * true perplexity needs ln(), which is libm-dependent and not
    * bit-portable across engines — see the text_tfidf rational-idf note).
    *
    * A bigram occurrence is "common" iff its corpus count c satisfies
    * c * 1000 >= total bigram occurrences — a RELATIVE threshold, so the
    * operator is scale-free: growing the corpus 100x does not silently
    * reclassify everything the way a fixed absolute count would.
    *
    * Output per doc: n_big (bigram occurrences), n_common, and
    * common_permille = floor(1000 * n_common / n_big) (NULL when the doc
    * has < 2 words; the doc still appears — explode_outer reasoning).
    *
    * Scale shape: scan 1 explodes bigrams into ONE gram-keyed partial+final
    * aggregate (output is bigram-vocab-sized, far below corpus size); the
    * corpus-total reduction and the threshold flag are computed ON that
    * aggregate (1-row broadcast crossJoin — the bounded shape, never
    * corpus-sized). Scan 2 re-explodes and shuffle-joins occurrences to the
    * flagged vocab on the gram key, then one doc-keyed aggregate. No
    * driver collect anywhere.
    */
  def bigramFluency(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val big = bigrams(docs, idCol, textCol)
    val cnt = big.groupBy(col("u"), col("v")).agg(count(lit(1)).as("_c"))
    val tot = cnt.agg(sum(col("_c")).as("_t"))
    val flagged = cnt.crossJoin(broadcast(tot))
      .select(col("u"), col("v"), (col("_c") * 1000L >= col("_t")).as("_common"))
    val perDoc = big.join(flagged, Seq("u", "v"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_big"),
        sum(when(col("_common"), 1L).otherwise(0L)).as("n_common"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("common_permille",
        when(col("n_big") > 0,
          floor(lit(1000L) * col("n_common") / col("n_big"))).cast("long"))
  }

  /** Per-document first-occurrence trigram novelty: of a document's
    * DISTINCT word trigrams, the fraction whose earliest corpus occurrence
    * (min doc id) is this document. The incremental-information signal a
    * dedup-adjacent curation pass wants: a document whose grams all first
    * appeared elsewhere adds nothing even if no near-dup rule fired.
    * Deterministic because "earliest" is the min of the ID (a total order),
    * not ingestion order.
    *
    * Scale shape: one explode into a (gram, doc)-keyed aggregate (the
    * distinct), then a window min PARTITIONED BY the gram — the second
    * exchange is gram-keyed, and no gram group outgrows a reducer unless a
    * single trigram dominates the corpus (in which case the aggregate
    * above already concentrated it to one row per containing doc, i.e.
    * group size <= n_docs containing it). Final doc-keyed aggregate + left
    * join keeps sub-3-word docs visible with zero counts.
    */
  def trigramNovelty(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tri = docs.select(col(idCol), ws(textCol))
      .select(col(idCol), explode(expr(
        "transform(slice(_ws, 1, greatest(size(_ws) - 2, 0)), " +
          "(u, i) -> concat(u, ' ', element_at(_ws, i + 2), ' ', element_at(_ws, i + 3)))"))
        .as("g"))
    val dg = tri.groupBy(col("g"), col(idCol)).agg(count(lit(1)).as("_m"))
    val flagged = dg.withColumn("_first",
      min(col(idCol)).over(Window.partitionBy(col("g"))))
    val perDoc = flagged.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_first") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_permille",
        when(col("n_grams") > 0,
          floor(lit(1000L) * col("n_novel") / col("n_grams"))).cast("long"))
  }

  /** Pairwise inter-source bigram-SET Jaccard — the source-level overlap
    * matrix a mixture designer reads before weighting corpora (two sources
    * that are near-copies should not both get full weight; a source with
    * zero overlap against everything is suspect). One row per unordered
    * source pair (src_a < src_b lexicographically, matching both engines'
    * binary string order), with set sizes, intersection, and
    * jaccard_permille = floor(1000 * inter / (sz_a + sz_b - inter)).
    *
    * Scale shape: one explode into a (source, gram) aggregate (the
    * per-source distinct — output bounded by sources x gram vocab); the
    * intersection is a gram-keyed self-join of that aggregate (a gram in
    * s sources fans out s^2/2 pairs — s is the SOURCE count, tens, not
    * data-sized); set sizes are a source-keyed aggregate (tiny) whose
    * pairing is a broadcast cross of two source-cardinality frames —
    * bounded by k^2 pairs, never by corpus size. Pairs with empty
    * intersection still appear (left join + coalesce 0).
    */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val sg = bigrams(docs, srcCol, textCol)
      .select(col(srcCol), concat(col("u"), lit(" "), col("v")).as("g"))
      .groupBy(col(srcCol), col("g")).agg(count(lit(1)).as("_m"))
    val sizes = sg.groupBy(col(srcCol)).agg(count(lit(1)).as("sz"))
    val inter = sg.select(col(srcCol).as("src_a"), col("g"))
      .join(sg.select(col(srcCol).as("src_b"), col("g")), Seq("g"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
    val pairs = sizes.select(col(srcCol).as("src_a"), col("sz").as("sz_a"))
      .crossJoin(broadcast(
        sizes.select(col(srcCol).as("src_b"), col("sz").as("sz_b"))))
      .filter(col("src_a") < col("src_b"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("sz_a"), col("sz_b"),
        coalesce(col("inter"), lit(0L)).as("inter"))
      .withColumn("jaccard_permille",
        floor(lit(1000L) * col("inter") /
          (col("sz_a") + col("sz_b") - col("inter"))).cast("long"))
  }
}

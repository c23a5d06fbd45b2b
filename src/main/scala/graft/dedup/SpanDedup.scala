package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-level cross-document duplicated-span analysis — the
  * exact-substring dedup signal (Lee et al., "Deduplicating Training Data
  * Makes Language Models Better"): a verbatim k-token run appearing in two
  * different documents marks memorization-prone duplicated text that
  * near-dup document hashes (MinHash/SimHash over whole docs) miss when
  * the surrounding text differs.
  *
  * Operates directly on the north-rule input shape
  * (doc_id, tokens:array<int32>, n_tok) — no detokenization.
  *
  * Two outputs share one occurrence pipeline:
  *   - [[dupSpanCoverage]]: per-document fraction of token POSITIONS
  *     covered by at least one duplicated k-gram (the per-doc gate signal);
  *   - [[hotSpans]]: the top repeated spans themselves (the "what is being
  *     copied" report an operator reads before adding a filter rule).
  *
  * Scale shape: one explode to k-gram starts (k-1 extra rows per doc vs
  * tokens, no k× token blowup — the gram key is built per START), then one
  * gram-keyed (gram, doc) aggregate whose output is bounded by distinct
  * (gram, doc) pairs, a gram-keyed count to find grams in ≥2 docs (only
  * DUPLICATED grams survive the filter — a tiny frame on real corpora),
  * and a gram-keyed join back of occurrences to that survivor set (AQE
  * broadcasts it when small; unhinted so a pathological all-duplicated
  * corpus still shuffles correctly). Coverage is a per-doc interval-union
  * computed with ONE lead() window over start positions — never an
  * explode of the k covered positions (that would be a k× row blowup on
  * exactly the duplicated-heavy documents). Gram keys in the coverage and
  * trim pipelines are 8-byte XXH64 hashes of the token slice
  * ([[graft.functions.TokenGramHash]], one tight loop per row) — the
  * rendered-string formulation was measured at 2.6 s of a 5 s query from
  * interpreted per-start lambdas alone (SpanProbe at 1.25M grams), with a
  * 5× wider shuffle key. The string pipeline remains for [[hotSpans]]
  * (whose OUTPUT is the gram) and as the reference side of the
  * hash-equivalence test; the DuckDB oracle groups exact string grams, so
  * the hash-green CORRECTNESS rows certify the hashed path end to end
  * (same trade as the hashed-shingle note in [[Dedup]]).
  */
object SpanDedup {

  /** One row per k-gram start: (idCol, start (1-based, long), g) with the
    * gram rendered as a space-joined string — the HUMAN-READABLE key, used
    * by the hot-span report (whose output IS the gram) and as the
    * reference formulation in the hash-equivalence test. Building ~40-char
    * strings through an interpreted lambda per start is the dominant cost
    * at volume (SpanProbe: 2.6 s of a 5 s query at 1.25M grams) — the
    * coverage/trim pipelines use [[occurrencesHashed]] instead.
    * Docs shorter than k contribute nothing (callers left-join them back).
    */
  private def occurrences(seqs: DataFrame, idCol: String, tokCol: String,
                          k: Int): DataFrame =
    seqs.select(col(idCol), col(tokCol))
      .filter(size(col(tokCol)) >= k)
      .select(col(idCol), posexplode(expr(
        s"transform(slice($tokCol, 1, size($tokCol) - ${k - 1}), " +
          s"(x, i) -> array_join(transform(slice($tokCol, i + 1, $k), " +
          "t -> CAST(t AS STRING)), ' '))")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("start"),
        col("col").as("g"))

  /** Same shape with an 8-byte XXH64 gram key ([[graft.functions
    * .TokenGramHash]] — one tight-loop eval per row, no per-start lambda,
    * 5× narrower shuffle key). Collision note on the expression.
    */
  private def occurrencesHashed(seqs: DataFrame, idCol: String,
                                tokCol: String, k: Int): DataFrame =
    seqs.select(col(idCol), col(tokCol))
      .filter(size(col(tokCol)) >= k)
      .select(col(idCol),
        posexplode(graft.functions.hashExprs.token_gram_hash(col(tokCol), k)))
      .select(col(idCol), (col("pos") + 1).cast("long").as("start"),
        col("col").as("g"))

  /** Grams that occur in ≥ 2 DISTINCT documents, with the min-doc owner.
    * ONE single-pass aggregate: "≥ 2 distinct docs" ⟺ min ≠ max over the
    * per-doc ids — cheaper than either count(DISTINCT) (Expand) or a
    * (gram,doc)→gram two-level shape (a second corpus-sized shuffle
    * measured at +1.1 s, SpanProbe3: nearly every (gram,doc) pair is
    * unique, so the first level compacts nothing). The min/max pair runs
    * on xxhash64(id) — primitive agg state instead of two per-group
    * UTF8String states across ~10^6 mostly-singleton groups (the measured
    * dominant cost of the string form); a hash collision can only MISS a
    * duplicate whose ENTIRE doc set collides (≤ n_pairs/2^64 — the same
    * accepted birthday class as TokenGramHash, and the DuckDB oracle
    * recomputes exactly, so any miss is a red CORRECTNESS row, not silent).
    * The string min(id) kept alongside doubles as [[trimSummary]]'s
    * canonical owner for free.
    */
  private def duplicatedGrams(occ: DataFrame, idCol: String): DataFrame = {
    val hid = xxhash64(col(idCol))
    occ.groupBy(col("g"))
      .agg(min(hid).as("_hl"), max(hid).as("_hh"),
        min(col(idCol)).as("_owner"))
      .filter(col("_hl") =!= col("_hh"))
      .select(col("g"), col("_owner"))
  }

  /** Per-document duplicated-span coverage: of the doc's n_tok token
    * positions, how many lie inside at least one k-gram that also occurs
    * verbatim in ANOTHER document. Output per doc (every doc appears, even
    * those shorter than k):
    *   n_dup_grams  — duplicated k-gram starts in this doc,
    *   dup_cov      — token positions covered (union of [s, s+k-1]),
    *   dup_permille — floor(1000 * dup_cov / n_tok).
    *
    * The interval union over sorted starts: each start contributes
    * min(k, next_start - start), the last contributes k — exact for
    * fixed-length intervals, one window pass.
    */
  def dupSpanCoverage(seqs: DataFrame, idCol: String, tokCol: String,
                      k: Int, hashedKeys: Boolean = true): DataFrame = {
    val occ =
      if (hashedKeys) occurrencesHashed(seqs, idCol, tokCol, k)
      else occurrences(seqs, idCol, tokCol, k)
    val dupOcc = occ.join(duplicatedGrams(occ, idCol).select(col("g")), Seq("g"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("start"))
    val perDoc = dupOcc
      .withColumn("_nxt", lead(col("start"), 1).over(w))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_grams"),
        sum(when(col("_nxt").isNull, lit(k.toLong))
          .otherwise(least(lit(k.toLong), col("_nxt") - col("start"))))
          .as("dup_cov"))
    seqs.select(col(idCol), col("n_tok"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tok"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("dup_cov"), lit(0L)).as("dup_cov"))
      .withColumn("dup_permille",
        when(col("n_tok") > 0,
          floor(lit(1000L) * col("dup_cov") / col("n_tok")))
          .otherwise(lit(0L)).cast("long"))
  }

  /** Duplicated-span TRIM summary — the action counterpart of
    * [[dupSpanCoverage]]: every duplicated k-gram keeps exactly ONE
    * canonical copy (the min-doc_id owner — a total order, so ownership
    * is deterministic and engine-independent) and every other occurrence
    * is marked for removal. Removed positions are reported as MAXIMAL
    * runs (gaps-and-islands over the sorted removal intervals: a new
    * island starts when start > running_max(end) + 1, i.e. adjacent runs
    * merge), and the rewrite is certified WITHOUT emitting token arrays:
    * kept_sum = sum(tokens) − Σ island slice-sums, which pins exactly
    * WHICH positions survived (same checksum idiom as seq_synth).
    *
    * Output per doc (all docs appear): n_tok, n_islands, n_removed,
    * kept_sum.
    *
    * Scale shape: the occurrence/duplicated-gram pipeline of
    * [[dupSpanCoverage]]; ownership is a min carried on the same
    * (gram,doc)→gram aggregate (no extra pass); non-owner occurrences —
    * bounded by the DUPLICATED volume, not the corpus — flow through one
    * per-doc window (running max end → island ids) and one
    * (doc, island) aggregate; the island frame joins back to the corpus
    * on the doc key for the slice-sums (AQE broadcasts it when small).
    * The owner keeps its copy even where it repeats the gram internally —
    * within-doc repetition is [[graft.curate.Curation.repetitionScore]]'s
    * axis, not this one.
    */
  def trimSummary(seqs: DataFrame, idCol: String, tokCol: String,
                  k: Int, hashedKeys: Boolean = true): DataFrame = {
    val occ =
      if (hashedKeys) occurrencesHashed(seqs, idCol, tokCol, k)
      else occurrences(seqs, idCol, tokCol, k)
    val removals = occ.join(duplicatedGrams(occ, idCol), Seq("g"))
      .filter(col(idCol) =!= col("_owner"))
      .select(col(idCol), col("start"), (col("start") + (k - 1)).as("end"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("start"), col("end"))
    val prevMax = max(col("end")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = removals
      .withColumn("_new",
        when(prevMax.isNull || col("start") > prevMax + 1, 1L).otherwise(0L))
      .withColumn("_isl", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_isl"))
      .agg(min(col("start")).as("a"), max(col("end")).as("b"))
    // r6: fold the (anomaly-sized) island frame to ONE row per doc first —
    // counts, removed length, and the island LIST — then a single join
    // attaches the corpus and computes both the total checksum and the
    // island slice-sums from the same token array. The r5 shape joined
    // the corpus twice (islandSums pass + totals pass) and aggregated the
    // per-island slice-sums in a separate shuffle; integer sums are
    // order-free, so folding them through the island array is
    // value-identical (oracle compare green).
    val perDocIslands = islands
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_ni"),
        sum(col("b") - col("a") + 1).as("_nr"),
        collect_list(struct(col("a"), col("b"))).as("_isls"))
    seqs.select(col(idCol), col("n_tok"), col(tokCol))
      .join(perDocIslands, Seq(idCol), "left")
      .select(col(idCol), col("n_tok"),
        coalesce(col("_ni"), lit(0L)).as("n_islands"),
        coalesce(col("_nr"), lit(0L)).as("n_removed"),
        (aggregate(col(tokCol), lit(0L), (acc, x) => acc + x) -
          coalesce(aggregate(col("_isls"), lit(0L), (acc, i) =>
            acc + aggregate(slice(col(tokCol), i.getField("a").cast("int"),
              (i.getField("b") - i.getField("a") + 1).cast("int")),
              lit(0L), (a2, x) => a2 + x)), lit(0L))).as("kept_sum"))
  }

  /** Token-level eval-overlap decontamination — the published k-token-gram
    * collision screen (GPT-3's 13-gram / PaLM's 8-gram appendix method),
    * run directly on the pre-tokenized arrays: a train document is
    * contaminated when ≥ minHits of its k-gram START positions match ANY
    * k-gram of the eval set. The word-text trigram path
    * ([[graft.curate.Curation]].decontaminate) needs text; this is the
    * variant for the north-rule token table, and it shares the hashed
    * occurrence pipeline with the span family.
    *
    * Output: (idCol, n_hits) for flagged train docs only.
    *
    * Scale shape: the eval side (benchmarks — tiny vs a 10^12-seq corpus)
    * reduces to a DISTINCT gram-hash set; the train side explodes once and
    * joins that set on the gram key (AQE broadcasts the eval set — the
    * probe filters BEFORE any train shuffle), then one train-doc-keyed
    * aggregate over HIT rows only. The train corpus itself never
    * shuffles. Hash keys as in the rest of the family (collision ⇒ a
    * spurious hit with probability ~|train grams|·|eval grams|/2^64;
    * the oracle recomputes exact string grams, so fixture-scale runs
    * certify the hashed path).
    */
  def crossSpanHits(train: DataFrame, evalSet: DataFrame, idCol: String,
                    tokCol: String, k: Int, minHits: Long): DataFrame = {
    val tocc = occurrencesHashed(train, idCol, tokCol, k)
    val eg = occurrencesHashed(evalSet, idCol, tokCol, k)
      .select(col("g")).distinct()
    tocc.join(eg, Seq("g"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Top repeated spans: duplicated k-grams ranked by total occurrence
    * count (then doc count, then the gram itself — a total order, so the
    * limit is deterministic). Output (g, n_docs, n_occ); TakeOrdered shape
    * — the full gram aggregate never reaches the driver.
    *
    * The expensive rendered-string grams are built ONLY for occurrences of
    * hash-duplicated grams (a pushed-down candidate filter: string-equal ⇒
    * hash-equal, so no true duplicate can be missed; a hash collision can
    * only ADD candidates, which the string-side n_docs ≥ 2 filter
    * re-screens — semantics identical to rendering everything, measured
    * ~2.5× faster at 1.25M grams). Ranking, tiebreak, and the emitted gram
    * text all operate on exact strings.
    */
  def hotSpans(seqs: DataFrame, idCol: String, tokCol: String, k: Int,
               topK: Int): DataFrame = {
    val occH = occurrencesHashed(seqs, idCol, tokCol, k)
    val cand = occH.join(duplicatedGrams(occH, idCol).select(col("g")), Seq("g"))
      .select(col(idCol), col("start"))
    cand.join(seqs.select(col(idCol), col(tokCol)), Seq(idCol))
      .select(col(idCol), expr(
        s"array_join(transform(slice($tokCol, CAST(start AS INT), $k), " +
          "t -> CAST(t AS STRING)), ' ')").as("g"))
      .groupBy(col("g"), col(idCol)).agg(count(lit(1)).as("_m"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_m")).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_occ").desc, col("n_docs").desc, col("g"))
      .limit(topK)
  }
}

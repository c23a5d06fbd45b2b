package graft.drift

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary drift between two epochs — the CATEGORICAL drift axis the
  * numeric checks miss: [[DriftCheck]]/[[DriftGate]]/PSI bucket a numeric
  * column (n_tok), so a tokenizer change, a language-mix shift, or a
  * corrupted id-remap that leaves LENGTHS identical is invisible to them,
  * while it reshapes the token-unigram distribution directly. Statistic:
  * total-variation distance over the token vocabulary,
  * `TV = ½ Σ_t |n0(t)/N0 − n1(t)/N1|`, computed INTEGER-EXACTLY on the
  * common-denominator numerator `Σ_t |n0·N1 − n1·N0|` in DECIMAL(38,0)
  * (10^12 sequences × 512 tokens ≈ 5·10^14 occurrences a side, so the
  * per-token product n0·N1 reaches ~2.5·10^29 — far past int64, well
  * inside DECIMAL(38)) with the final
  * permille via the pmod floor-division identity — zero IEEE ops, the
  * report is bit-identical in any engine (the [[SourceAnomaly]] idiom on
  * the vocab domain).
  *
  * Scale shape: the only corpus pass is explode(tokens) into ONE
  * token-keyed partial+final aggregate with CONDITIONAL per-epoch sums —
  * no densify join is ever needed because a token missing from an epoch
  * simply has that conditional sum = 0 in its single row. Output is
  * vocab-sized (≤ 2^15 here, ≤ a few 10^5 for real BPE vocabs); totals
  * reduce that frame to one broadcast row. Everything downstream is
  * arithmetic on the vocab frame.
  */
object VocabDrift {

  private val Dec = "decimal(38,0)"

  /** Per-token epoch counts (tok, n0, n1) — one explode, one aggregate. */
  private def vocabHist(seqs: DataFrame, tokCol: String,
                        epochCol: String): DataFrame =
    seqs.select(col(epochCol).as("_e"), explode(col(tokCol)).as("tok"))
      .groupBy(col("tok"))
      .agg(sum(when(col("_e") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("_e") === 1, 1L).otherwise(0L)).as("n1"))

  private def withNum(hist: DataFrame): DataFrame = {
    val totals = hist.agg(sum(col("n0")).as("_N0"), sum(col("n1")).as("_N1"))
    hist.crossJoin(broadcast(totals))
      .withColumn("_diff",
        col("n0").cast(Dec) * col("_N1").cast(Dec) -
          col("n1").cast(Dec) * col("_N0").cast(Dec))
      .withColumn("_num", abs(col("_diff")))
  }

  /** One-row summary: epoch totals, per-epoch and shared vocab sizes, and
    * tv_permille = floor(1000 · Σ|n0·N1 − n1·N0| / (2·N0·N1)). NULL tv if
    * either epoch is empty.
    */
  def tvSummary(seqs: DataFrame, tokCol: String, epochCol: String): DataFrame = {
    val agg = withNum(vocabHist(seqs, tokCol, epochCol))
      .agg(
        max(col("_N0")).as("n0_total"), max(col("_N1")).as("n1_total"),
        sum(when(col("n0") > 0, 1L).otherwise(0L)).as("vocab0"),
        sum(when(col("n1") > 0, 1L).otherwise(0L)).as("vocab1"),
        sum(when(col("n0") > 0 && col("n1") > 0, 1L).otherwise(0L)).as("vocab_shared"),
        sum(col("_num")).cast(Dec).as("_sum"))
      .withColumn("_d",
        lit(2).cast(Dec) * col("n0_total").cast(Dec) * col("n1_total").cast(Dec))
      .withColumn("_x", lit(1000).cast(Dec) * col("_sum"))
    agg.select(
      col("n0_total"), col("n1_total"),
      col("vocab0"), col("vocab1"), col("vocab_shared"),
      when(col("n0_total") > 0 && col("n1_total") > 0,
        ((col("_x") - pmod(col("_x"), col("_d"))) / col("_d")).cast("long"))
        .as("tv_permille"))
  }

  /** Top-k most-shifted tokens: abs share delta in PARTS PER MILLION
    * (floor(10^6·|n0·N1 − n1·N0| / (N0·N1)) — a single token's share is
    * tiny, so permille would floor everything to 0), direction +1 when the
    * token lost mass from epoch 0 to 1, −1 when it gained, 0 at exact
    * balance. Deterministic total order (delta desc, tok asc). The 10^6
    * multiplier keeps the numerator ≤ ~10^35, inside DECIMAL(38).
    */
  def topShifted(seqs: DataFrame, tokCol: String, epochCol: String,
                 k: Int): DataFrame =
    withNum(vocabHist(seqs, tokCol, epochCol))
      .withColumn("_d", col("_N0").cast(Dec) * col("_N1").cast(Dec))
      .withColumn("_x", lit(1000000).cast(Dec) * col("_num"))
      .select(col("tok"), col("n0"), col("n1"),
        ((col("_x") - pmod(col("_x"), col("_d"))) / col("_d")).cast("long")
          .as("shift_ppm"),
        when(col("_diff") > 0, 1L).when(col("_diff") < 0, -1L).otherwise(0L)
          .as("dir"))
      .orderBy(col("shift_ppm").desc, col("tok"))
      .limit(k)
}

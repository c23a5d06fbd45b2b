package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Deduplication suite for training-data pipelines:
  *  - exact (content-hash groupBy),
  *  - n-gram Jaccard with prefix blocking,
  *  - MinHash + LSH banding,
  *  - SimHash (63-bit) with band blocking.
  *
  * All stages are pure Catalyst columns + joins/aggregations — the shapes
  * that scale: candidate generation is always a key-equality self-join on a
  * compact blocking key (band bucket), never an all-pairs product, so at
  * 10^12 docs the shuffle volume is O(docs × bands), and verification runs
  * only on candidate pairs. Arithmetic is modular (< 2^63) — safe under
  * Spark 4 ANSI mode.
  */
object Dedup {

  private val P = 1000000007L

  // ---------- exact ----------

  /** Exact duplicate groups by content hash: (h, cnt, exemplar). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("exemplar"))
      .filter(col("cnt") > 1)

  // ---------- shingles + Jaccard ----------

  /** Distinct word 3-gram shingles. */
  def shingles(text: Column): Column = {
    val ws = TextAnalysis.words(text)
    array_distinct(transform(sequence(lit(0), size(ws) - 3),
      j => concat_ws(" ", element_at(ws, j + 1), element_at(ws, j + 2), element_at(ws, j + 3))))
  }

  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** n-gram Jaccard near-dup pairs, blocked on a text-prefix hash so the
    * self-join is key-equality (no cross product). Returns
    * (doc_a, doc_b, jac) with doc_a < doc_b and jac >= threshold.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        threshold: Double, blockPrefixChars: Int = 24): DataFrame = {
    val t = df.select(
      col(idCol).as("doc_id"),
      md5(substring(col(textCol), 1, blockPrefixChars)).as("blk"),
      shingles(col(textCol)).as("sh"))
    val a = t.select(col("doc_id").as("doc_a"), col("blk"), col("sh").as("sha"))
    val b = t.select(col("doc_id").as("doc_b"), col("blk"), col("sh").as("shb"))
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jac", round(jaccard(col("sha"), col("shb")), 6))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  // ---------- MinHash + LSH ----------

  /** MinHash signature: numPerm permuted min-hashes over the shingle set.
    * h_j(s) = ((xxhash64(s) mod P) * (2j+1) + j*97911) mod P — all
    * intermediates < 1e15, overflow-free.
    */
  def minhashSignature(sh: Column, numPerm: Int): Column =
    transform(sequence(lit(0), lit(numPerm - 1)), j =>
      array_min(transform(sh, s =>
        (pmod(xxhash64(s), lit(P)) * (j * 2 + 1) + j * 97911L) % P)))

  /** LSH banding: (band index, band-bucket hash) per signature band. */
  def bandBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        hash(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))

  /** Full MinHash-LSH near-dup pipeline:
    * shingle → sign → band → bucket self-join → Jaccard verify.
    * Returns (doc_a, doc_b, jac) pairs with jac >= threshold.
    */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      threshold: Double, numPerm: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPerBand = numPerm / bands
    val t = df.select(col(idCol).as("doc_id"), shingles(col(textCol)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numPerm))
    val bucketed = t.select(col("doc_id"), col("sh"),
        explode(bandBuckets(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bucket"))
    val a = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("sh").as("sha"))
    val b = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("sh").as("shb"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sha"), col("shb"))
      .dropDuplicates("doc_a", "doc_b") // same pair may collide in several bands
      .withColumn("jac", round(jaccard(col("sha"), col("shb")), 6))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  // ---------- SimHash ----------

  /** 63-bit SimHash over word hashes (bit 63 unused: 2^63 overflows signed
    * long and ANSI mode rejects the wrap). Bit i's per-word ±1 vote comes
    * from the parity of the seeded hash xxhash64(word, i) — avoids
    * bit-extraction arithmetic on a single 64-bit hash, which cannot be
    * done exactly with column math under ANSI (no variable-shift builtin).
    */
  def simhash(text: Column): Column = {
    val ws = TextAnalysis.words(text)
    // per-word ±1 contribution per bit, summed into a 63-int accumulator
    val bitSums = aggregate(
      ws,
      array_repeat(lit(0), 63),
      (acc, w) => zip_with(acc,
        transform(sequence(lit(0), lit(62)),
          i => when(pmod(xxhash64(w, i), lit(2L)) === 1L, 1).otherwise(-1)),
        (a, b) => a + b))
    // assemble sign bits into a long via precomputed powers of two
    val powers = typedlit((0 until 63).map(i => 1L << i))
    aggregate(zip_with(bitSums, powers, (s, p) => when(s > 0, p).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** 16-bit band values of a simhash for blocking (4 bands: bits 0-15,
    * 16-31, 32-47, 48-62). Band index is a plan-time literal, so the shift
    * width is constant (Spark's shiftright takes a literal int).
    */
  def simhashBands(sim: Column): Column =
    array((0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftright(sim, b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))): _*)

  /** SimHash near-dup pairs: band-blocked self-join + Hamming verify. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val t = df.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sim"))
    val bucketed = t.select(col("doc_id"), col("sim"), explode(simhashBands(col("sim"))).as("bb"))
      .select(col("doc_id"), col("sim"), col("bb.band"), col("bb.bucket"))
    val a = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("sim").as("sim_a"))
    val b = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
  }
}

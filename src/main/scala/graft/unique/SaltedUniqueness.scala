package graft.unique

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-uniqueness check with skew-safe aggregation (SURVEY §2.3 T6;
  * BASELINE.json:14 "uniqueness on doc_id via salted hash-aggregate with
  * explicit skew handling").
  *
  * The skew salt is Spark's map-side partial aggregation itself: the
  * partial HashAggregate combines per input partition, so a hot key
  * duplicated 10^6× across P map tasks sends at most P pre-counted rows to
  * its reducer — the same fan-in bound an explicit (key, partition_id)
  * salt gives, without the second full shuffle that salt costs in the
  * mostly-distinct regime (measured 2× the uniqueness wall at 5×10^7 rows;
  * BENCH/BASELINE.md). [[duplicatesExplicitSalt]] keeps the manual
  * two-stage form as a control and for engines where partial aggregation
  * is not guaranteed; [[duplicatesHashCompacted]] trades a second scan for
  * an 8-byte shuffle key.
  *
  * NULL keys are excluded: null-ness is the Required constraint's job
  * (one violation per cause — FIXTURES.md §3).
  */
object SaltedUniqueness {

  /** Duplicate keys with their total multiplicity (cnt > 1).
    *
    * Single `groupBy(key).count`: Spark's map-side partial aggregation IS
    * the salt — the partial HashAggregate combines per input partition, so
    * a key duplicated 10^6× across P map tasks contributes at most P rows
    * to the shuffle, the same per-reducer fan-in bound the explicit
    * (key, salt) two-stage form gives. The explicit form costs a SECOND
    * full shuffle when keys are mostly distinct (stage-1 reduces nothing:
    * 50M rows → 318 MB + 378 MB shuffled twice, measured in
    * BENCH/BASELINE.md) — in the expected mostly-unique validation regime
    * that doubles the shuffle and adds a full extra hash-aggregate pass.
    * [[duplicatesExplicitSalt]] keeps the manual form for engines/regimes
    * where partial aggregation cannot be relied on.
    */
  def duplicates(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Explicit two-stage salted form: salt = spark_partition_id(), stage 1
    * bounds per-reducer fan-in even if map-side partial aggregation were
    * disabled or the input arrived pre-shuffled by key. Costs one extra
    * full shuffle in the mostly-distinct regime — prefer [[duplicates]].
    */
  def duplicatesExplicitSalt(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(col(key), spark_partition_id().as("_salt"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(key))
      .agg(sum(col("_c")).as("cnt"))
      .filter(col("cnt") > 1)

  /** Violation rows keyed (key, constraint_id) — one per duplicate key.
    *
    * Uses [[duplicatesHashCompacted]]: in a validation engine duplicates
    * are anomalies, so the dup-hash broadcast is anomaly-sized and the
    * 8-byte-key pass is both faster AND scales better than the string agg
    * (measured at 2×10^8 rows, 128 shuffle partitions: 41.5→12.9 s for
    * 8→32 cores = 0.81 efficiency, vs 50.6→20.0 s = 0.63 for the
    * string-key form — the narrower shuffle and hash-map rows relieve the
    * shared-DRAM path that caps 32-thread scaling). Since round 3 the
    * hash-compacted path self-gates on the measured dup-hash cardinality,
    * so adversarial mostly-duplicate input degrades to the unconditional
    * single-shuffle [[duplicates]] instead of OOMing a forced broadcast.
    */
  def violations(df: DataFrame, key: String, constraintId: String): DataFrame =
    duplicatesHashCompacted(df, key).select(col(key), lit(constraintId).as("constraint_id"))

  /** Property-test reference name. Deliberately byte-identical to
    * [[duplicates]] since round 2: the production path's skew bound IS the
    * map-side partial aggregate (pinned by PlanSpec's partial_count
    * assertion), so there is no separate "naive" form left to diverge
    * from — the name survives so property tests read as
    * salted-vs-reference even if [[duplicates]] regains an explicit salt.
    */
  def naiveDuplicates(df: DataFrame, key: String): DataFrame =
    duplicates(df, key)

  /** Hash-compaction variant for the mostly-unique regime (the expected
    * shape of a 10^12-row validation input): stage 1 aggregates over
    * `xxhash64(key)` instead of the key itself — 8-byte fixed-width grouping
    * keys hit the codegen'd fast hash map and shuffle ~3x fewer bytes than
    * 16+-char strings — then candidate hash groups (rare) are re-verified
    * EXACTLY on the true key via a broadcast semi-join + second aggregate,
    * so hash collisions can never produce a false duplicate.
    *
    * Same output contract as [[duplicates]]. The dup-hash set is
    * data-dependent — on adversarial mostly-duplicate input it is
    * O(distinct keys) and a forced broadcast would OOM (VERDICT r2 #3) —
    * so stage 1 is gated by a LIMIT-bounded collect: at most
    * maxBroadcastKeys+1 8-byte hashes ever cross to the driver (~16 MB at
    * the default), and above the threshold the whole plan falls back to
    * [[duplicates]], whose single shuffle is unconditional and disk-backed.
    *
    * EAGER AT CALL TIME (ADVICE/VERDICT r3 #5): building this DataFrame
    * runs stage 1 as a Spark job — the gate cannot be decided lazily
    * because the CHOICE of physical plan depends on the data. In exchange,
    * nothing stays persisted in the session (r3's persist+count left a
    * cache entry per call) and the returned plan is fully lazy and
    * self-contained: the dup-hash set rides in it as a LocalRelation, so
    * re-running the returned frame never recomputes stage 1. Callers
    * composing validation plans (Validator.run/violations) therefore
    * trigger one job per Unique constraint at plan-BUILD time.
    *
    * Measured at 2×10^8 rows / 128 shuffle partitions: 18%% faster at 8
    * cores, 36%% at 32, with 8→32 efficiency 0.81 vs 0.63 — the 8-byte
    * rows halve the shuffle and hash-map DRAM traffic that caps 32-thread
    * scaling on one memory system (BENCH/BASELINE.md attribution).
    */
  def duplicatesHashCompacted(df: DataFrame, key: String,
                              maxBroadcastKeys: Long = 2000000L): DataFrame = {
    val limit = math.min(maxBroadcastKeys + 1L, Int.MaxValue.toLong).toInt
    val dupHashes: Array[Long] = df.filter(col(key).isNotNull)
      .select(xxhash64(col(key)).as("_h"))
      .groupBy(col("_h")).agg(count(lit(1)).as("_cnt")).filter(col("_cnt") > 1)
      .select("_h")
      .limit(limit)
      .collect().map(_.getLong(0))
    if (dupHashes.length > maxBroadcastKeys) {
      // mostly-duplicate regime: the compaction premise (anomaly-sized dup
      // set) is false — run the plain skew-safe aggregate, which never
      // broadcasts anything
      duplicates(df, key)
    } else if (dupHashes.isEmpty) {
      // ZERO candidate hashes — the expected steady state of a validated
      // production table. Every true duplicate key's hash IS a duplicate
      // hash, so an empty candidate set PROVES no duplicates exist and the
      // whole verify pass is empty. Encode that as Filter(false) on the
      // same plan shape: PropagateEmptyRelation folds it to an empty
      // LocalRelation and — decisive at suite level — deletes this branch
      // from the violations UNION outright, removing an entire corpus
      // scan from the main job (measured: the unique probe branch was one
      // of three full-input branches in the 2×10^8-row headline job).
      // Schema is identical to the join path by construction.
      df.filter(lit(false))
        .filter(col(key).isNotNull)
        .groupBy(col(key)).agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
    } else {
      // ≤ maxBroadcastKeys 8-byte hashes, shipped as a LocalRelation: the
      // broadcast build is a driver-local copy, no cache entry, no second
      // stage-1 pass on the returned (lazy) plan
      val spark = df.sparkSession
      import spark.implicits._
      val dupH = dupHashes.toSeq.toDF("_h")
      df.filter(col(key).isNotNull)
        .join(broadcast(dupH), xxhash64(col(key)) === col("_h"), "left_semi")
        .groupBy(col(key)).agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
    }
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.run.IncrementalRunner
import graft.io.TableIO
import graft.unique.SaltedUniqueness

/** Scale-safety evidence for the data-dependent-broadcast fixes (VERDICT r2
  * "What's wrong" #2/#3): the uniqueness production path and the resume
  * path must COMPLETE — and stay correct — on adversarial mostly-duplicate
  * input, where the duplicate set is O(distinct keys) and any forced
  * broadcast of it (or of the slice's key→partition map) would OOM at
  * 10^12 rows.
  */
class AdversarialSpec extends SparkTestBase {

  test("hash-compacted uniqueness degrades to the unconditional shuffle on " +
       "mostly-duplicate 10^7-row input (dup-hash set far above the gate)") {
    // 10^7 rows, 5M distinct keys, EVERY key duplicated exactly twice: the
    // dup-hash set is 5M > the 2M default gate, so the compacted path must
    // fall back to duplicates() — no broadcast of a 5M-row set anywhere
    val n = 10000000L
    val df = spark.range(n).select(
      concat(lit("key-"), (col("id") % (n / 2)).cast("string")).as("doc_id"))
    val dups = SaltedUniqueness.duplicatesHashCompacted(df, "doc_id")
    // fallback plan must not contain a broadcast exchange at all
    assert(!dups.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
      dups.queryExecution.executedPlan.toString.take(2000))
    assert(dups.count() === n / 2)
  }

  test("hash-compacted path agrees with duplicates() on both sides of the gate") {
    val df = spark.range(1000).select(
      concat(lit("k"), (col("id") % 600).cast("string")).as("doc_id"))
    val expected = SaltedUniqueness.duplicates(df, "doc_id")
      .collect().map(_.mkString("|")).sorted.toSeq
    // gate passes (400 dup hashes < huge threshold) → compacted broadcast path
    val viaBroadcast = SaltedUniqueness.duplicatesHashCompacted(df, "doc_id")
      .collect().map(_.mkString("|")).sorted.toSeq
    // gate forced shut → fallback path
    val viaFallback = SaltedUniqueness.duplicatesHashCompacted(df, "doc_id", maxBroadcastKeys = 0L)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(viaBroadcast === expected)
    assert(viaFallback === expected)
  }

  test("resume path completes on mostly-duplicate input without broadcasting " +
       "the slice key→partition map, attributing dups to their partitions") {
    // every doc_id appears in BOTH partitions → the dup set is O(keys),
    // the old broadcast(slice key map) shape would pin the whole input
    val keys = spark.range(50000)
      .select(concat(lit("d"), col("id").cast("string")).as("doc_id"))
    val input = keys.withColumn("source", lit("srcA"))
      .unionByName(keys.withColumn("source", lit("srcB")))
      .withColumn("tokens", array(lit(1), lit(2)))
      .withColumn("n_tok", lit(2))
      .withColumn("epoch", lit(0L))
    val base = Files.createTempDirectory("graft_adv").toString
    val runner = IncrementalRunner(
      TableIO(spark), TokenSchema.sequences, "doc_id", "source",
      s"$base/violations", s"$base/summary", s"$base/checkpoint")
    val dim = spark.range(2).select(
      when(col("id") === 0, "srcA").otherwise("srcB").as("source"))
    val r = runner.run(input, Map("sources" -> dim), "run-adv")
    assert(r.processedPartitions.toSet === Set("srcA", "srcB"))
    val v = spark.read.parquet(s"$base/violations")
    // one unique_doc_id violation per (key, partition): 50k keys × 2 parts
    assert(v.filter(col("constraint_id") === "unique_doc_id").count() === 100000L)
    // regex violations also fire (doc_id format) — just assert presence of
    // the uniqueness rows per partition
    assert(v.filter(col("constraint_id") === "unique_doc_id")
      .groupBy(col("source")).count().collect().map(_.getLong(1)).toSeq === Seq(50000L, 50000L))
  }

  test("probeBuckets enumerates choose(nbits, ≤radius) masks — linear in " +
       "masks, usable at nbits=30") {
    val t0 = System.nanoTime()
    val probes = graft.sim.Knn.probeBuckets(lit(5L), 30, 2)
    val builtMs = (System.nanoTime() - t0) / 1000000
    assert(builtMs < 2000, s"plan-time mask generation took ${builtMs}ms")
    val row = spark.range(1).select(probes.as("p")).head()
    val buckets = row.getSeq[Long](0)
    // 1 + C(30,1) + C(30,2) = 1 + 30 + 435
    assert(buckets.size === 466)
    assert(buckets.distinct.size === 466)
    assert(buckets.forall(b => java.lang.Long.bitCount(b ^ 5L) <= 2))
  }

  test("span family completes and stays exact on an ALL-duplicate corpus " +
      "(every gram in every doc)") {
    // worst case for the candidate pushdown: the hash-duplicated survivor
    // set is the whole corpus, so the hot-span render and the coverage
    // join degrade to corpus-sized — they must stay LINEAR (no all-pairs
    // product anywhere) and exact: identical docs cover every position
    import spark.implicits._
    val n = 200
    val toks = (1 to 40).toList
    val df = (0 until n).map(i => (f"d$i%04d", toks)).toDF("doc_id", "tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))
      .withColumn("n_tok", size(col("tokens")))
    val cov = graft.dedup.SpanDedup.dupSpanCoverage(df, "doc_id", "tokens", 8)
    assert(cov.filter(col("dup_cov") =!= 40).count() === 0)
    assert(cov.count() === n)
    val hot = graft.dedup.SpanDedup.hotSpans(df, "doc_id", "tokens", 8, 5)
      .collect()
    assert(hot.length === 5)
    assert(hot.forall(_.getAs[Long]("n_docs") === n.toLong))
    // trim: d0000 owns everything; everyone else loses their whole doc
    val tr = graft.dedup.SpanDedup.trimSummary(df, "doc_id", "tokens", 8)
    assert(tr.filter(col("doc_id") === "d0000")
      .head().getAs[Long]("n_removed") === 0L)
    assert(tr.filter(col("doc_id") =!= "d0000")
      .filter(col("n_removed") =!= 40 || col("kept_sum") =!= 0).count() === 0)
  }
}

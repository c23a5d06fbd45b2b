package graft

import org.apache.spark.sql.functions._
import graft.dedup.SpanDedup
import graft.gen.SyntheticTokens

/** Token-level duplicated-span coverage (SpanDedup): interval-union math,
  * cross-doc-only flagging, short-doc visibility, and the planted-span
  * corpus expectations.
  */
class SpanSpec extends SparkTestBase {

  import spark.implicits._

  private def cov(rows: Seq[(String, Seq[Int])], k: Int = 8) = {
    val df = rows.toDF("doc_id", "tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))
      .withColumn("n_tok", size(col("tokens")))
    SpanDedup.dupSpanCoverage(df, "doc_id", "tokens", k)
      .select("doc_id", "n_dup_grams", "dup_cov", "dup_permille")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
  }

  test("shared 10-token run: overlapping starts union to exactly 10 covered positions per doc") {
    // A carries the run at positions 1..10, B at positions 3..12; the
    // 3 duplicated 8-gram starts per doc overlap, so the interval union
    // must collapse to 10 positions, not 3*8=24.
    val run = (1 to 10).toSeq
    val a = run ++ Seq(100, 101, 102, 103, 104, 105)
    val b = Seq(50, 51) ++ run ++ Seq(60, 61, 62, 63)
    val m = cov(Seq("a" -> a, "b" -> b))
    assert(m("a") === ((3L, 10L, 625L))) // floor(1000*10/16)
    assert(m("b") === ((3L, 10L, 625L)))
  }

  test("disjoint shared runs accumulate coverage; within-doc repetition alone does not fire") {
    // c shares run1 with d at its head and run2 with d at its tail,
    // separated by unique filler — two disjoint 8-intervals = 16.
    val run1 = (1 to 8).toSeq
    val run2 = (21 to 28).toSeq
    val c = run1 ++ Seq(200, 201, 202, 203) ++ run2
    val d = run2 ++ Seq(300, 301, 302, 303) ++ run1
    // e repeats ITS OWN 8-gram twice but shares nothing with others
    val e = (401 to 408) ++ Seq(999) ++ (401 to 408)
    val m = cov(Seq("c" -> c, "d" -> d, "e" -> e.toSeq))
    assert(m("c") === ((2L, 16L, 800L))) // floor(1000*16/20)
    assert(m("d") === ((2L, 16L, 800L)))
    assert(m("e") === ((0L, 0L, 0L)))
  }

  test("docs shorter than k still appear with zero coverage") {
    val m = cov(Seq("s" -> Seq(1, 2, 3), "t" -> (1 to 12).toSeq, "u" -> (1 to 12).toSeq))
    assert(m("s") === ((0L, 0L, 0L)))
    assert(m("t")._2 === 12L) // full shared doc
  }

  test("planted-span corpus: planted docs cover exactly the 32-token block, unplanted docs read zero; hotSpans surfaces the block") {
    val sp = SyntheticTokens.spannedFrom(spark, "/root/testdata/sf0.001")
    val out = SpanDedup.dupSpanCoverage(sp, "doc_id", "tokens", 8)
      .join(sp.select(col("doc_id"), col("orig")), "doc_id")
    val isPlanted = pmod(col("orig"), lit(50L)).isin(11L, 12L, 13L) &&
      col("n_tok") >= 64
    val planted = out.filter(isPlanted)
    assert(planted.count() > 0)
    // variable-step streams: cross-doc duplication is EXACTLY the plant
    assert(planted.filter(col("dup_cov") =!= 32).count() === 0)
    assert(planted.filter(col("n_dup_grams") =!= 25).count() === 0)
    assert(out.filter(!isPlanted).filter(col("dup_cov") =!= 0).count() === 0)
    // the shared block's interior grams dominate the hot-span report
    val hot = SpanDedup.hotSpans(sp, "doc_id", "tokens", 8, 20)
      .select("g", "n_docs").as[(String, Long)].collect()
    val blockTok = (0 until 32).map(i => (i * 1009 + 13) % 32768)
    val blockGram = blockTok.take(8).mkString(" ")
    assert(hot.exists(_._1 == blockGram), s"block gram absent from top-20")
    val nPlanted = planted.count()
    assert(hot.filter(_._1 == blockGram).head._2 === nPlanted)
  }

  private def trim(rows: Seq[(String, Seq[Int])], k: Int = 8) = {
    val df = rows.toDF("doc_id", "tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))
      .withColumn("n_tok", size(col("tokens")))
    SpanDedup.trimSummary(df, "doc_id", "tokens", k)
      .select("doc_id", "n_islands", "n_removed", "kept_sum")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
  }

  test("trim: min-doc owner keeps its copy, the other doc loses exactly the union of the shared run") {
    val run = (1 to 10).toSeq
    val a = run ++ Seq(100, 101, 102, 103, 104, 105)
    val b = Seq(50, 51) ++ run ++ Seq(60, 61, 62, 63)
    val m = trim(Seq("a" -> a, "b" -> b))
    assert(m("a") === ((0L, 0L, 670L)))  // owner untouched: full sum
    // b removes positions 3..12 (one island), keeps 402 - 55 = 347
    assert(m("b") === ((1L, 10L, 347L)))
  }

  test("trim: disjoint removals stay two islands; adjacent removals merge into one") {
    val run1 = (1 to 8).toSeq
    val run2 = (21 to 28).toSeq
    val c = run1 ++ Seq(200, 201, 202, 203) ++ run2
    val d = run2 ++ Seq(300, 301, 302, 303) ++ run1
    val m1 = trim(Seq("c" -> c, "d" -> d))
    assert(m1("c") === ((0L, 0L, 1038L)))           // owner of both runs
    assert(m1("d") === ((2L, 16L, 1206L)))          // [1,8] and [13,20] disjoint
    // p shares runA (owned by o1) at 1..8 and runB (owned by o2) at 9..16:
    // the two intervals are ADJACENT, so they must merge to ONE island
    val runA = (31 to 38).toSeq
    val runB = (41 to 48).toSeq
    val o1 = runA ++ (500 to 506).toSeq
    val o2 = runB ++ (600 to 606).toSeq
    val p = runA ++ runB ++ Seq(700, 701)
    val m2 = trim(Seq("o1" -> o1, "o2" -> o2, "p" -> p))
    assert(m2("o1")._2 === 0L)
    assert(m2("o2")._2 === 0L)
    assert(m2("p") === ((1L, 16L, 1401L)))
  }

  test("trim: planted corpus — every non-owner planted doc loses >= the 32-token block; owners keep totals") {
    val sp = SyntheticTokens.spannedFrom(spark, "/root/testdata/sf0.001")
    val out = SpanDedup.trimSummary(sp, "doc_id", "tokens", 8)
      .join(sp.select(col("doc_id"), col("orig")), "doc_id")
    val planted = out.filter(pmod(col("orig"), lit(50L)).isin(11L, 12L, 13L) &&
      col("n_tok") >= 64)
    val minId = planted.agg(min(col("doc_id"))).head().getString(0)
    assert(planted.filter(col("doc_id") =!= minId)
      .filter(col("n_removed") =!= 32 || col("n_islands") =!= 1).count() === 0)
    assert(planted.filter(col("doc_id") === minId)
      .filter(col("n_removed") =!= 0).count() === 0)
    // removal never exceeds the doc and kept_sum stays within the total
    assert(out.filter(col("n_removed") > col("n_tok")).count() === 0)
    assert(out.filter(col("kept_sum") < 0).count() === 0)
  }

  test("span decontamination flags exactly the planted train classes sharing the eval block") {
    val sp = SyntheticTokens.spannedFrom(spark, "/root/testdata/sf0.001")
    val ev = sp.filter(pmod(col("orig"), lit(50L)) === 11L)
    val tr = sp.filter(pmod(col("orig"), lit(50L)) =!= 11L)
    val hits = SpanDedup.crossSpanHits(tr, ev, "doc_id", "tokens", 8, 1L)
      .join(sp.select(col("doc_id"), col("orig"), col("n_tok")), "doc_id")
    val expected = tr.filter(pmod(col("orig"), lit(50L)).isin(12L, 13L) &&
      col("n_tok") >= 64).count()
    assert(expected > 0)
    assert(hits.count() === expected)
    assert(hits.filter(!(pmod(col("orig"), lit(50L)).isin(12L, 13L) &&
      col("n_tok") >= 64)).count() === 0)
    // every contaminated doc hits on exactly the 25 block-interior starts
    assert(hits.filter(col("n_hits") =!= 25).count() === 0)
  }

  test("coverage invariants: dup_cov <= n_tok and dup_cov <= k * n_dup_grams") {
    val sp = SyntheticTokens.spannedFrom(spark, "/root/testdata/sf0.001")
    val out = SpanDedup.dupSpanCoverage(sp, "doc_id", "tokens", 8)
    assert(out.filter(col("dup_cov") > col("n_tok")).count() === 0)
    assert(out.filter(col("dup_cov") > lit(8L) * col("n_dup_grams")).count() === 0)
  }

  test("hashed gram keys reproduce the string-gram pipeline exactly (coverage and trim)") {
    val sp = SyntheticTokens.spannedFrom(spark, "/root/testdata/sf0.001")
    val covH = SpanDedup.dupSpanCoverage(sp, "doc_id", "tokens", 8)
    val covS = SpanDedup.dupSpanCoverage(sp, "doc_id", "tokens", 8, hashedKeys = false)
    assert(covH.exceptAll(covS).count() === 0L)
    assert(covS.exceptAll(covH).count() === 0L)
    val trH = SpanDedup.trimSummary(sp, "doc_id", "tokens", 8)
    val trS = SpanDedup.trimSummary(sp, "doc_id", "tokens", 8, hashedKeys = false)
    assert(trH.exceptAll(trS).count() === 0L)
    assert(trS.exceptAll(trH).count() === 0L)
  }

  test("cross-operator: trim removals are a subset of span coverage on every doc") {
    // a removed occurrence is a duplicated occurrence whose owner is
    // elsewhere — so per doc, n_removed <= dup_cov always, and a doc that
    // owns nothing it duplicates has n_removed == dup_cov
    val sp = SyntheticTokens.spannedFrom(spark, "/root/testdata/sf0.001")
    val covd = SpanDedup.dupSpanCoverage(sp, "doc_id", "tokens", 8)
      .select(col("doc_id"), col("dup_cov"))
    val trm = SpanDedup.trimSummary(sp, "doc_id", "tokens", 8)
      .select(col("doc_id"), col("n_removed"))
    val j = covd.join(trm, "doc_id")
    assert(j.filter(col("n_removed") > col("dup_cov")).count() === 0)
    // and globally something must actually be removed on the planted corpus
    assert(j.agg(sum(col("n_removed"))).head().getLong(0) > 0L)
  }
}

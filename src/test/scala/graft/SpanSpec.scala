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

  test("planted-span corpus: every planted doc (cls 11-13, n_tok>=64) covers >=32 positions; hotSpans surfaces the block") {
    val sp = SyntheticTokens.spannedFrom(spark, "/root/testdata/sf0.001")
    val out = SpanDedup.dupSpanCoverage(sp, "doc_id", "tokens", 8)
      .join(sp.select(col("doc_id"), col("orig")), "doc_id")
    val planted = out.filter(pmod(col("orig"), lit(50L)).isin(11L, 12L, 13L) &&
      col("n_tok") >= 64)
    assert(planted.count() > 0)
    assert(planted.filter(col("dup_cov") < 32).count() === 0)
    assert(planted.filter(col("n_dup_grams") < 25).count() === 0)
    // the shared block's interior grams dominate the hot-span report
    val hot = SpanDedup.hotSpans(sp, "doc_id", "tokens", 8, 20)
      .select("g", "n_docs").as[(String, Long)].collect()
    val blockTok = (0 until 32).map(i => (i * 1009 + 13) % 32768)
    val blockGram = blockTok.take(8).mkString(" ")
    assert(hot.exists(_._1 == blockGram), s"block gram absent from top-20")
    val nPlanted = planted.count()
    assert(hot.filter(_._1 == blockGram).head._2 === nPlanted)
  }

  test("coverage invariants: dup_cov <= n_tok and dup_cov <= k * n_dup_grams") {
    val sp = SyntheticTokens.spannedFrom(spark, "/root/testdata/sf0.001")
    val out = SpanDedup.dupSpanCoverage(sp, "doc_id", "tokens", 8)
    assert(out.filter(col("dup_cov") > col("n_tok")).count() === 0)
    assert(out.filter(col("dup_cov") > lit(8L) * col("n_dup_grams")).count() === 0)
  }
}

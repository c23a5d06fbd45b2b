package graft

import org.apache.spark.sql.functions._
import graft.text.NgramStats

/** Corpus n-gram statistics: hand-computed fixtures for bigram fluency,
  * trigram novelty, and source overlap, plus the edge cases the left joins
  * exist for (sub-n-word docs, empty intersections).
  */
class NgramSpec extends SparkTestBase {

  import spark.implicits._

  test("bigram fluency: relative threshold and exact permille on a hand corpus") {
    // bigrams: "a b" x3 (docs 1,2,3), "b a" x1 (doc 2), "c d" x1 (doc 4).
    // total 5 occurrences; common iff c*1000 >= 5 -- all counts >= 1 pass
    // here, so shrink the threshold's bite with a skewed corpus below.
    val docs = Seq(
      (1L, "a b"), (2L, "a b b a"), (3L, "a b"), (4L, "c d"), (5L, "x")
    ).toDF("doc_id", "text")
    val out = NgramStats.bigramFluency(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
    // doc 5 has one word: zero bigrams, NULL permille, but still present
    assert(out.length === 5)
    val d5 = out.find(_.getLong(0) == 5L).get
    assert(d5.getLong(1) === 0L && d5.getLong(2) === 0L && d5.isNullAt(3))
    val d2 = out.find(_.getLong(0) == 2L).get
    assert(d2.getLong(1) === 3L) // "a b", "b b", "b a"
  }

  test("bigram fluency: rare grams fall below the relative threshold") {
    // 1000 copies of "p q" vs one "r s": total 1001, threshold c*1000>=1001
    // => "p q" (c=1000) common, "r s" (c=1) rare.
    val many = (1L to 1000L).map(i => (i, "p q"))
    val docs = (many :+ (2000L, "r s")).toDF("doc_id", "text")
    val out = NgramStats.bigramFluency(docs, "doc_id", "text")
    val rare = out.filter(col("doc_id") === 2000L).collect().head
    assert(rare.getLong(1) === 1L && rare.getLong(2) === 0L &&
      rare.getLong(3) === 0L)
    val common = out.filter(col("doc_id") === 1L).collect().head
    assert(common.getLong(2) === 1L && common.getLong(3) === 1000L)
  }

  test("trigram novelty: first doc owns shared grams; later copies score zero") {
    val docs = Seq(
      (1L, "a b c d"),   // grams "a b c", "b c d" -- both first here
      (2L, "a b c d"),   // same grams, first_doc=1 -> 0 novel
      (3L, "z z z z z")  // grams "z z z" (distinct once) -- novel
    ).toDF("doc_id", "text")
    val out = NgramStats.trigramNovelty(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 2L && out(0).getLong(2) === 2L &&
      out(0).getLong(3) === 1000L)
    assert(out(1).getLong(1) === 2L && out(1).getLong(2) === 0L &&
      out(1).getLong(3) === 0L)
    // doc 3: 3 trigram OCCURRENCES but 1 DISTINCT gram
    assert(out(2).getLong(1) === 1L && out(2).getLong(2) === 1L)
  }

  test("trigram novelty: sub-3-word docs surface with zero grams") {
    val docs = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val out = NgramStats.trigramNovelty(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(1).getLong(1) === 0L && out(1).isNullAt(3))
  }

  test("source overlap: exact jaccard permille and empty-intersection pairs") {
    val docs = Seq(
      ("s1", "a b c"),  // bigram set {a b, b c}
      ("s2", "a b d"),  // {a b, b d}
      ("s3", "x y")     // {x y}
    ).toDF("source", "text")
    val out = NgramStats.sourceOverlap(docs, "source", "text")
      .orderBy("src_a", "src_b").collect()
    assert(out.length === 3) // all pairs, including zero-overlap ones
    val p12 = out(0)
    assert(p12.getString(0) === "s1" && p12.getString(1) === "s2")
    // inter {a b} = 1, union = 2+2-1 = 3 -> floor(1000/3) = 333
    assert(p12.getLong(4) === 1L && p12.getLong(5) === 333L)
    val p13 = out(1)
    assert(p13.getLong(4) === 0L && p13.getLong(5) === 0L)
  }

  test("fluency/novelty totals are partition-invariant") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val a = NgramStats.bigramFluency(base.repartition(1), "doc_id", "text")
    val b = NgramStats.bigramFluency(base.repartition(13), "doc_id", "text")
    assert(a.orderBy("doc_id").collect().toSeq ===
      b.orderBy("doc_id").collect().toSeq)
  }
}

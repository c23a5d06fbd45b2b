package graft

import org.apache.spark.sql.functions._
import graft.drift.VocabDrift
import graft.gen.SyntheticTokens

/** Categorical vocab drift: sensitivity to a planted token remap,
  * zero-drift identity, and bounds on the sf0.001 corpus.
  */
class VocabDriftSpec extends SparkTestBase {

  import spark.implicits._

  private def frame(rows: Seq[(Int, Seq[Int])]) =
    rows.toDF("epoch", "tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))

  test("disjoint vocabularies give TV = 1000 permille; identical epochs give 0") {
    val disjoint = frame(Seq(
      0 -> Seq(1, 2, 3, 4), 0 -> Seq(2, 3),
      1 -> Seq(9, 9, 8), 1 -> Seq(7, 8, 9)))
    val r = VocabDrift.tvSummary(disjoint, "tokens", "epoch").head()
    assert(r.getAs[Long]("tv_permille") === 1000L)
    assert(r.getAs[Long]("vocab_shared") === 0L)
    val same = frame(Seq(0 -> Seq(1, 2, 3), 1 -> Seq(1, 2, 3)))
    val r2 = VocabDrift.tvSummary(same, "tokens", "epoch").head()
    assert(r2.getAs[Long]("tv_permille") === 0L)
    assert(r2.getAs[Long]("vocab_shared") === 3L)
  }

  test("a planted remap is the top shifted token with the right direction") {
    // epoch 1 replaces every token 5 with 6: 5 loses all epoch-1 mass
    // (dir +1), 6 gains it (dir -1)
    val df = frame(Seq(
      0 -> Seq(5, 5, 5, 5, 1, 2, 3), 0 -> Seq(5, 6, 1, 2, 3),
      1 -> Seq(6, 6, 6, 6, 1, 2, 3), 1 -> Seq(6, 6, 1, 2, 3)))
    val top = VocabDrift.topShifted(df, "tokens", "epoch", 2)
      .select("tok", "dir").as[(Int, Long)].collect()
    assert(top.toSet === Set((5, 1L), (6, -1L)))
  }

  test("sf0.001 corpus: tv in [0,1000], shared vocab bounded, totals match the generator") {
    val seqs = SyntheticTokens.cleanFrom(spark, "/root/testdata/sf0.001")
    val r = VocabDrift.tvSummary(seqs, "tokens", "epoch").head()
    val tv = r.getAs[Long]("tv_permille")
    assert(tv >= 0L && tv <= 1000L)
    assert(r.getAs[Long]("vocab_shared") <=
      math.min(r.getAs[Long]("vocab0"), r.getAs[Long]("vocab1")))
    assert(r.getAs[Long]("n0_total") + r.getAs[Long]("n1_total") ===
      seqs.agg(sum(col("n_tok"))).head().getLong(0))
    // parity epochs of the same generator are similar but not identical
    assert(tv > 0L)
  }
}

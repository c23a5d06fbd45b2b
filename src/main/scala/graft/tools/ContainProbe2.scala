package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.functions.hashExprs

/** Dev probe (r6): bisect dedup_containment's residual wall stage by
  * stage — index build, posting aggregate, screen, verify — under the
  * bench session shape (extensions via runmain.sh -D, AQE, toRdd
  * materialization, min of 2 reps after a warmup rep, cache cleared
  * between reps exactly as Bench does).
  */
object ContainProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus: DataFrame = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      d.unionByName(
        d.filter(pmod(col("doc_id"), lit(25L)) === 3L)
          .select((col("doc_id") + 300000L).as("doc_id"),
            array_join(slice(split(trim(col("text")), "\\s+"), 1, 12), " ").as("text")))
    }
    def th: DataFrame = graft.plans.Widen(
        corpus.select(col("doc_id"), col("text").as("_text")))
      .select(col("doc_id"),
        hashExprs.hashed_word_shingles(TextAnalysis.words(col("_text")), 3).as("shh"))
      .filter(size(col("shh")) > 0)
      .withColumn("sz", size(col("shh")))
    def postingsOf(t: DataFrame): DataFrame = t
      .select(col("doc_id"), explode(col("shh")).as("gh"))
      .groupBy(col("gh"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) <= 100)
      .select(col("ids"))
    def mat(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def t(name: String)(f: => Long): Unit = {
      f; spark.catalog.clearCache()
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[cp2] $name%-28s ${reps.map(_._1).min}%7.3f s  (${reps.head._2})")
    }
    t("th.materialize")(mat(th))
    t("postings.materialize")(mat(postingsOf(th)))
    t("screen.pairsAgg") {
      val p = postingsOf(th)
      mat(p.select(explode(col("ids")).as("doc_a"), col("ids"))
        .select(col("doc_a"), explode(col("ids")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("_cl")))
    }
    t("full.current")(mat(
      graft.dedup.Dedup.containmentPairs(corpus, "text", "doc_id", 0.9, 100)
        .orderBy(col("doc_a"), col("doc_b"))))
    // variant: NO eager postings.count() (pipeline fully lazy, AQE may
    // rebuild the posting subtree per consumer — the documented reason
    // for the eager fill; re-measure to confirm it still holds)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r6 scratch: candidate volume of the containment pipeline at sf0.1. */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.filter(pmod(col("doc_id"), lit(25L)) === 3L)
        .select((col("doc_id") + 300000L).as("doc_id"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 12), " ").as("text")))
    val th = corpus.select(col("doc_id"),
      graft.functions.hashExprs.hashed_word_shingles(
        graft.text.TextAnalysis.words(col("text")), 3).as("shh"))
      .filter(size(col("shh")) > 0)
    val postings = th.select(col("doc_id"), explode(col("shh")).as("gh"))
      .groupBy(col("gh")).agg(collect_list(col("doc_id")).as("ids"))
    println("[cp] docs          = " + th.count())
    println("[cp] postings      = " + postings.count())
    println("[cp] lists>cap     = " + postings.filter(size(col("ids")) > 100).count())
    val cand = postings.filter(size(col("ids")) <= 100)
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
    println("[cp] raw cand rows = " + cand.count())
    println("[cp] distinct cand = " + cand.dropDuplicates("doc_a", "doc_b").count())
    s.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Dev tool: time each stage of the MinHash-LSH dedup pipeline and count
  * intermediates — pinpoints whether candidates, verify, or signature
  * dominates on the driver test corpus.
  */
object DedupProbe {
  def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[dp] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r)")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // mirror Queries.nearDupCorpus
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val planted = d.filter(pmod(col("doc_id"), lit(20L)) === 0L)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" graft extra suffix tokens")).as("text"))
    val corpus = d.select(col("doc_id"), col("text")).unionByName(planted)

    val numPerm = 32; val bands = 16; val rowsPerBand = 2
    val ws = corpus.select(col("doc_id"), TextAnalysis.words(col("text")).as("_ws"))
    val t = ws.select(col("doc_id"), Dedup.shinglesOfWords(col("_ws")).as("sh"))
      .filter(size(col("sh")) > 0)
    timed("shingles count")(t.count())
    timed("shingles again (warm)")(t.count())
    val sig = t.select(col("doc_id"), Dedup.minhashSignature(col("sh"), numPerm).as("sig"))
    timed("signatures")(sig.count())
    val bucketed = t.select(col("doc_id"), explode(
        Dedup.bandBuckets(Dedup.minhashSignature(col("sh"), numPerm), bands, rowsPerBand)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    timed("bucketed rows")(bucketed.count())
    val a = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val rawPairs = a.join(b, Seq("band", "bucket")).filter(col("doc_a") < col("doc_b"))
    timed("raw candidate pairs")(rawPairs.count())
    val pairs = rawPairs.select(col("doc_a"), col("doc_b")).dropDuplicates("doc_a", "doc_b")
    timed("deduped candidate pairs")(pairs.count())
    timed("full pipeline")(
      Dedup.minhashLshPairs(corpus, "text", "doc_id", 0.3).count())
    timed("full pipeline again")(
      Dedup.minhashLshPairs(corpus, "text", "doc_id", 0.3).count())
    spark.stop()
  }
}

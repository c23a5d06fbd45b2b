package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev tool: hamming distance + band-collision status for every TRUE
  * near-dup pair (evidence for the simhash recall parameters).
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(
        docs.filter(pmod(col("doc_id"), lit(20L)) === 0L)
          .select((col("doc_id") + 100000L).as("doc_id"),
            concat(col("text"), lit(" graft extra suffix tokens")).as("text")))
      // ground truth via the trusted minhash pipeline (oracle-verified)
      val truth = Dedup.minhashLshPairs(corpus, "text", "doc_id", 0.3)
        .select("doc_a", "doc_b")
      val sim = corpus.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      val joined = truth
        .join(sim.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
        .join(sim.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
        .withColumn("ham", bit_count(col("sa").bitwiseXOR(col("sb"))))
        .withColumn("bandhit",
          (0 until 4).map(b =>
            (shiftright(col("sa"), b * 16).bitwiseAND(lit(0xFFFFL)) ===
             shiftright(col("sb"), b * 16).bitwiseAND(lit(0xFFFFL))).cast("int"))
            .reduce(_ + _))
      println(s"== $dir (truth pairs: ${truth.count()})")
      joined.groupBy(col("ham"), (col("bandhit") > 0).as("anyBand"))
        .count().orderBy("ham").show(50)
    }
    spark.stop()
  }
}

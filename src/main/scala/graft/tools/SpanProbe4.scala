package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.functions.hashExprs

/** Dev probe: span_hot stage bisect after the hash-candidate rewrite. */
object SpanProbe4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 8
    def seqs = SyntheticTokens.spannedFrom(spark, dir)
    def occH = seqs.select(col("doc_id"), col("tokens"))
      .filter(size(col("tokens")) >= k)
      .select(col("doc_id"),
        posexplode(hashExprs.token_gram_hash(col("tokens"), k)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("start"),
        col("col").as("g"))
    def dupG = occH.groupBy(col("g"))
      .agg(min(col("doc_id")).as("_owner"), max(col("doc_id")).as("_hi"))
      .filter(col("_owner") =!= col("_hi")).select(col("g"))
    def cand = occH.join(dupG, Seq("g")).select(col("doc_id"), col("start"))
    def rendered = cand.join(seqs.select(col("doc_id"), col("tokens")), Seq("doc_id"))
      .select(col("doc_id"), expr(
        s"array_join(transform(slice(tokens, CAST(start AS INT), $k), " +
          "t -> CAST(t AS STRING)), ' ')").as("g"))
    def t(name: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe4] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n)")
    }
    t("dupG.count")(dupG.count())
    t("cand.count")(cand.count())
    t("rendered.count")(rendered.count())
    t("full.count")(rendered.groupBy(col("g"), col("doc_id"))
      .agg(count(lit(1)).as("_m")).groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_m")).as("n_occ"))
      .filter(col("n_docs") >= 2).count())
    spark.stop()
  }
}

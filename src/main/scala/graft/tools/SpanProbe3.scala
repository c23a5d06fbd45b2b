package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.functions.hashExprs

/** Dev probe: hashed span pipeline stage costs at sf0.1. */
object SpanProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 8
    def occH = SyntheticTokens.spannedFrom(spark, dir)
      .select(col("doc_id"), col("tokens"))
      .filter(size(col("tokens")) >= k)
      .select(col("doc_id"),
        posexplode(hashExprs.token_gram_hash(col("tokens"), k)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("start"),
        col("col").as("g"))
    def spanned = SyntheticTokens.spannedFrom(spark, dir)
    def t(name: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe3] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n)")
    }
    t("spanned.matcount")(spanned.queryExecution.toRdd.count())
    t("occH.count")(occH.count())
    t("occH.matcount")(occH.queryExecution.toRdd.count())
    t("aggGD.count")(occH.groupBy(col("g"), col("doc_id"))
      .agg(count(lit(1)).as("_m")).count())
    t("agg2.count")(occH.groupBy(col("g"), col("doc_id"))
      .agg(count(lit(1)).as("_m")).groupBy(col("g"))
      .agg(count(lit(1)).as("_nd")).filter(col("_nd") >= 2).count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.gen.SyntheticTokens

/** Dev probe: bisect span_hot's wall at sf0.1 across pipeline prefixes. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 8
    def occ = {
      val sp = SyntheticTokens.spannedFrom(spark, dir)
      sp.select(col("doc_id"), col("tokens"))
        .filter(size(col("tokens")) >= k)
        .select(col("doc_id"), posexplode(expr(
          s"transform(slice(tokens, 1, size(tokens) - ${k - 1}), " +
            s"(x, i) -> array_join(transform(slice(tokens, i + 1, $k), " +
            "t -> CAST(t AS STRING)), ' '))")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("start"),
          col("col").as("g"))
    }
    def t(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n)")
    }
    t("occ.count")(occ.count())
    t("agg(g,doc).count")(occ.groupBy(col("g"), col("doc_id"))
      .agg(count(lit(1)).as("_m")).count())
    t("agg2(g).count")(occ.groupBy(col("g"), col("doc_id"))
      .agg(count(lit(1)).as("_m"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_m")).as("n_occ")).count())
    t("filtered.count")(occ.groupBy(col("g"), col("doc_id"))
      .agg(count(lit(1)).as("_m"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_m")).as("n_occ"))
      .filter(col("n_docs") >= 2).count())
    t("topk.collect")(occ.groupBy(col("g"), col("doc_id"))
      .agg(count(lit(1)).as("_m"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_m")).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_occ").desc, col("n_docs").desc, col("g"))
      .limit(20).collect().length.toLong)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Queries

/** Dev probe: dedup_span cost under count() vs full materialization —
  * is count() letting Catalyst skip the gram pipeline?
  */
object SpanProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      f
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe2] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($r)")
    }
    t("dedup_span.count")(Queries.dedupSpan(spark, dir).count())
    t("dedup_span.sum(all)")(Queries.dedupSpan(spark, dir)
      .agg(sum(col("dup_cov") + col("n_dup_grams") + col("dup_permille")))
      .head().getLong(0))
    t("span_trim.count")(Queries.spanTrim(spark, dir).count())
    t("span_trim.sum(all)")(Queries.spanTrim(spark, dir)
      .agg(sum(col("n_removed") + col("kept_sum") + col("n_islands")))
      .head().getLong(0))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.functions.hashExprs

/** Dev probe (r6): attribute the span family's residual wall — token
  * generation vs gram-hash explode vs the aggregate/join tail — and
  * measure an occ-persist variant of dupSpanCoverage (the occurrence
  * frame has two consumers: the duplicated-gram aggregate and the
  * coverage join; without a persist the generation+hash pipeline runs
  * once per consumer). Bench-parity session (extensions via runmain.sh
  * -D, AQE on, toRdd materialization, min of 2 reps after warmup).
  */
object SpanProbe5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = 8
    def seqs = SyntheticTokens.spannedFrom(spark, dir)
    def occH(s: DataFrame) = s.select(col("doc_id"), col("tokens"))
      .filter(size(col("tokens")) >= k)
      .select(col("doc_id"),
        posexplode(hashExprs.token_gram_hash(col("tokens"), k)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("start"),
        col("col").as("g"))
    def cover(occ: DataFrame, s: DataFrame): DataFrame = {
      val hid = xxhash64(col("doc_id"))
      val dupG = occ.groupBy(col("g"))
        .agg(min(hid).as("_hl"), max(hid).as("_hh"))
        .filter(col("_hl") =!= col("_hh")).select(col("g"))
      val dupOcc = occ.join(dupG, Seq("g"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("start"))
      val perDoc = dupOcc
        .withColumn("_nxt", lead(col("start"), 1).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_dup_grams"),
          sum(when(col("_nxt").isNull, lit(k.toLong))
            .otherwise(least(lit(k.toLong), col("_nxt") - col("start"))))
            .as("dup_cov"))
      s.select(col("doc_id"), col("n_tok"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tok"),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
          coalesce(col("dup_cov"), lit(0L)).as("dup_cov"))
    }
    def mat(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def t(name: String)(f: => Long): Unit = {
      f; spark.catalog.clearCache()
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe5] $name%-28s ${reps.map(_._1).min}%7.3f s  (${reps.head._2})")
    }
    t("sp.materialize")(mat(seqs))
    t("occH.materialize")(mat(occH(seqs)))
    t("cover.current")(mat(cover(occH(seqs), seqs)))
    t("cover.occPersist") {
      val o = occH(seqs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try mat(cover(o, seqs)) finally o.unpersist(blocking = false)
    }
    // hotSpans tail: rendered strings for duplicated candidates only
    t("trim.current")(mat(graft.dedup.SpanDedup.trimSummary(seqs, "doc_id", "tokens", k)))
    spark.stop()
  }
}

package graft.drift

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-sectional source-anomaly detection: each source's value
  * distribution vs the REST of the corpus (leave-one-out), the "which
  * upstream scraper broke" check. [[DriftCheck]]/[[DriftGate]] are
  * TEMPORAL (epoch vs epoch, within a slice); this is the orthogonal axis —
  * one producer drifting away from its peers inside a single snapshot,
  * which an epoch-pair test cannot see when the break predates both epochs.
  *
  * Statistic: total-variation distance in permille,
  * `TV(s) = ½ Σ_b |c_s(b)/n_s − c_r(b)/n_r|`, computed INTEGER-EXACTLY on
  * the common-denominator numerator `Σ_b |c_s·n_r − c_r·n_s|` in
  * DECIMAL(38,0) (at 10^12 rows a side the per-bucket product reaches
  * ~10^24 — far past int64; ANSI Spark would throw rather than wrap) with
  * ONE exact floor-division at the end via the pmod identity
  * `(x − pmod(x, d)) / d` — no IEEE arithmetic anywhere, so the report is
  * bit-identical in any engine (same rationale as [[DriftCheck.emd]]'s
  * numerator, taken one step further: even the final division is exact).
  *
  * Scale shape: the ONLY corpus pass is the (source, bucket) histogram —
  * partial+final hash aggregate, key space #sources × #buckets. The
  * leave-one-out table is then densified source×bucket (bounded-domain
  * cross join, rows = #sources × #buckets, never corpus-sized — the same
  * argument as vocab_coverage's vocab frame) and everything downstream is
  * window math over that tiny frame.
  */
object SourceAnomaly {

  /** Per-source report: (source, n, tv_permille, anomalous) ordered by
    * source. `anomalous` = tv_permille > gatePermille. A source whose
    * complement is empty (single-source corpus) reports NULL tv and false.
    */
  def tvPerSource(df: DataFrame, valueCol: String, sourceCol: String,
                  bucketWidth: Long, gatePermille: Int = 600): DataFrame = {
    val dec = "decimal(38,0)"
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(
        col(sourceCol).as("source"),
        floor(col(valueCol).cast("double") / bucketWidth.toDouble).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    // densify: a source with zero mass in some bucket still contributes
    // |0·n_r − c_r·n_s| there — missing rows would silently drop TV mass
    val dense = hist.select(col("source")).distinct()
      .crossJoin(hist.select(col("bucket")).distinct())
      .join(hist, Seq("source", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
    val perBucket = dense
      .withColumn("tot_b", sum(col("cnt")).over(Window.partitionBy(col("bucket"))))
      .withColumn("n_s", sum(col("cnt")).over(Window.partitionBy(col("source"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
      .withColumn("num_b", abs(
        col("cnt").cast(dec) * (col("n") - col("n_s")).cast(dec) -
          (col("tot_b") - col("cnt")).cast(dec) * col("n_s").cast(dec)))
    val agg = perBucket.groupBy(col("source"))
      .agg(max(col("n_s")).as("_ns"), max(col("n")).as("_n"),
        sum(col("num_b")).cast(dec).as("_num"))
      .withColumn("_nr", (col("_n") - col("_ns")).cast(dec))
      .withColumn("_d", lit(2).cast(dec) * col("_ns").cast(dec) * col("_nr"))
      .withColumn("_x", lit(1000).cast(dec) * col("_num"))
    agg.select(
      col("source"),
      col("_ns").cast("long").as("n"),
      when(col("_nr") > 0,
        ((col("_x") - pmod(col("_x"), col("_d"))) / col("_d")).cast("long"))
        .as("tv_permille"),
      when(col("_nr") > 0,
        ((col("_x") - pmod(col("_x"), col("_d"))) / col("_d")).cast("long") >
          gatePermille)
        .otherwise(lit(false)).as("anomalous"))
      .orderBy(col("source"))
  }
}

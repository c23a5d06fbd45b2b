package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of an embedding column — the storage/transport
  * half of the ANN story (graft.sim.Knn is the query half): a 64-dim
  * float32 vector is 256 B raw, 64 B quantized, so at 10^12 vectors
  * quantization is the difference between a 256 TB and a 64 TB index —
  * and int8 dot products are what a production rescorer SIMD-crunches.
  *
  * Two phases, both bounded:
  *   1. fit: per-dimension (min, max) over the corpus — posexplode into a
  *      64-key aggregate. Partial aggregation compacts each input split
  *      to ≤ dims rows before the exchange, so the shuffle carries
  *      O(dims × partitions) rows at ANY corpus size; the driver collect
  *      is dim-bounded (like the IVF codebook, VERDICT r3).
  *   2. apply: q_i = clamp(floor((v_i − min_i)·scale_i + 0.5), 0, 255)
  *      with scale_i = 255/(max_i − min_i) pre-divided ONCE at fit time.
  *      The params ride a custom expression (functions.QuantizeInt8) as
  *      plan literals — the corpus side stays a shuffle-free projection.
  *
  * Bit-portability: subtract → multiply-by-pre-divided-scale → +0.5 →
  * floor, each an individually correctly-rounded IEEE double op, so the
  * DuckDB oracle replaying the same op order reproduces identical
  * integers (same argument as the mixture sampler's sqrt, OracleSql).
  */
object Quantize {

  /** One-pass per-dimension fit. Returns (mins, scales), each `dims` long,
    * dimension-ordered. `scale = 0` for a constant dimension (all values
    * quantize to 0 — information-free either way).
    */
  def fitMinMax(df: DataFrame, embCol: String): (Seq[Double], Seq[Double]) = {
    val dims = df
      .select(posexplode(col(embCol)).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy(col("dim"))
      .collect()
    val mins = dims.map(_.getFloat(1).toDouble).toSeq
    val scales = dims.map { r =>
      val mn = r.getFloat(1).toDouble
      val mx = r.getFloat(2).toDouble
      if (mx == mn) 0.0 else 255.0 / (mx - mn)
    }.toSeq
    (mins, scales)
  }

  /** Quantization report: integer-exact per-vector facts (sum, first/last
    * element, saturation count) rather than the arrays themselves — the
    * same ship-checksums-not-arrays compare convention as seq_synth. The
    * full quantized column is `quantize_int8(col, mins, scales)` for
    * callers that materialize it.
    */
  def report(df: DataFrame, embCol: String, idCol: String,
             mins: Seq[Double], scales: Seq[Double]): DataFrame = {
    import graft.functions.hashExprs.quantize_int8
    val q = quantize_int8(col(embCol), mins, scales)
    df.select(col(idCol),
        q.as("_q"),
        size(col(embCol)).as("_n"))
      .select(col(idCol),
        aggregate(col("_q"), lit(0L), (a, x) => a + x).as("q_sum"),
        element_at(col("_q"), 1).cast("long").as("q_first"),
        element_at(col("_q"), col("_n")).cast("long").as("q_last"),
        size(filter(col("_q"), x => x === 0 || x === 255)).cast("long").as("n_sat"))
  }
}

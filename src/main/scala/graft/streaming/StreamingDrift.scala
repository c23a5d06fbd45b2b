package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.constraint.Drift

/** Streaming face of the drift gate (SURVEY §2.2 streaming row: "drift
  * sketch would become flatMapGroupsWithState" — here it does): per-group
  * epoch histograms live in keyed state, updated per micro-batch, and every
  * batch emits the current two-sample KS/χ² verdict for the groups it
  * touched. State is bounded: two maps of ≤ #buckets entries per group,
  * independent of stream length.
  *
  * Same statistics as the batch gate to the rounding digit —
  * [[StreamingDrift.computeKsChi2]] is cross-checked against
  * [[graft.drift.DriftGate.groupedStats]] in StreamingSpec.
  */
object StreamingDrift {

  /** Keyed state: per-epoch bucket counts. */
  final case class DriftHists(c0: Map[Int, Long], c1: Map[Int, Long])

  /** Per-batch verdict row for one group. */
  final case class DriftVerdict(group: String, ks: Double, chi2: Double,
                                n0: Long, n1: Long, drifting: Boolean)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Two-sample KS + χ² from per-epoch bucket histograms — the plain-Scala
    * twin of the batch gate's sorted-array scan (same guards: a one-epoch
    * sample carries no drift evidence, KS = 0).
    */
  def computeKsChi2(c0: Map[Int, Long], c1: Map[Int, Long]): (Double, Double, Long, Long) = {
    val n0 = c0.values.sum
    val n1 = c1.values.sum
    var cum0 = 0L; var cum1 = 0L; var ks = 0.0; var chi2 = 0.0
    (c0.keySet ++ c1.keySet).toSeq.sorted.foreach { b =>
      val a = c0.getOrElse(b, 0L); val z = c1.getOrElse(b, 0L)
      cum0 += a; cum1 += z
      if (n0 > 0 && n1 > 0)
        ks = math.max(ks, math.abs(cum0.toDouble / n0 - cum1.toDouble / n1))
      val e0 = n0.toDouble * (a + z) / (n0 + n1)
      val e1 = n1.toDouble * (a + z) / (n0 + n1)
      if (e0 > 0) chi2 += math.pow(a - e0, 2) / e0
      if (e1 > 0) chi2 += math.pow(z - e1, 2) / e1
    }
    (round6(ks), round6(chi2), n0, n1)
  }

  /** Attach the drift gate to a stream, keyed by `groupCol`. Update output
    * mode: each micro-batch emits the refreshed verdict for touched groups.
    */
  def driftByGroup(stream: DataFrame, d: Drift, groupCol: String): Dataset[DriftVerdict] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .filter(col(d.column).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(d.epochColumn).cast("int").as("e"),
        floor(col(d.column).cast("double") / d.bucketWidth.toDouble).cast("int").as("b"))
      .as[(String, Int, Int)]
      .groupByKey(_._1)
      .mapGroupsWithState[DriftHists, DriftVerdict](GroupStateTimeout.NoTimeout) {
        (g, rows, state) =>
          var DriftHists(c0, c1) = state.getOption.getOrElse(DriftHists(Map.empty, Map.empty))
          rows.foreach { case (_, e, b) =>
            if (e == 0) c0 = c0.updated(b, c0.getOrElse(b, 0L) + 1L)
            else if (e == 1) c1 = c1.updated(b, c1.getOrElse(b, 0L) + 1L)
          }
          state.update(DriftHists(c0, c1))
          val (ks, chi2, n0, n1) = computeKsChi2(c0, c1)
          DriftVerdict(g, ks, chi2, n0, n1, ks > d.ksThreshold)
      }
  }
}

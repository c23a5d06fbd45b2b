package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens

/** r6 probe for VERDICT r5 next-round #3: the `unique` component's 8→32
  * efficiency (r5 attribution: 0.230). The suite's unique cost is
  * duplicatesHashCompacted's stage 1 — ONE wide hash aggregate over
  * xxhash64(doc_id) with ~rows distinct keys. Variants:
  *
  *   partial — the production shape: groupBy(_h).count (map-side partial
  *             agg builds a rows/P-entry hash map per task, exchange
  *             carries (h, cnt) = 16 B/row, final agg rebuilds the map)
  *   repart  — pre-merge-free control: repartition(_h) then aggregate —
  *             the exchange carries bare 8 B hashes and no map-side
  *             compaction map is built before it (the partial+final pair
  *             still runs post-shuffle in one stage)
  *   twolevel — the SURVEY §4 "tree-shaped merge": aggregate by
  *             (pmod(_h, parts*8), _h) first (bounded sub-maps), then by
  *             _h — two exchanges, each narrower in live map state
  *
  * Interleaved rounds over {lo, hi} cores, min per level, reported as
  * wall + efficiency = t_lo / ((hi/lo) * t_hi). All variants compute the
  * same dup-hash set (count >= 2 filter at the end keeps the job
  * result-shaped); correctness is not the question here — walls are.
  */
object UniqueProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(200000000L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val lo = sys.env.getOrElse("UP_LO", "8").toInt
    val hi = sys.env.getOrElse("UP_HI", "32").toInt
    val shuf = sys.env.getOrElse("UP_SHUF", "128").toInt
    val inParts = 128

    def session(cores: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", shuf.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    def hashes(s: SparkSession): DataFrame =
      SyntheticTokens.synthetic(s, rows, inParts)
        .select(xxhash64(col("doc_id")).as("_h"))

    val variants: Seq[(String, SparkSession => Long)] = Seq(
      "partial" -> { s =>
        hashes(s).groupBy(col("_h")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).count()
      },
      "repart" -> { s =>
        hashes(s).repartition(col("_h"))
          .groupBy(col("_h")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).count()
      },
      "twolevel" -> { s =>
        hashes(s)
          .groupBy(pmod(col("_h"), lit((shuf * 8).toLong)).as("_b"), col("_h"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("_h")).agg(sum(col("c")).as("c"))
          .filter(col("c") > 1).count()
      })

    val best = scala.collection.mutable.Map[(String, Int), Double]()
    for (r <- 1 to rounds; cores <- Seq(hi, lo)) {
      val s = session(cores)
      try {
        for ((name, f) <- variants) {
          if (r == 1) f(s) // warmup per (variant, level, session shape)
          val t0 = System.nanoTime()
          f(s)
          val w = (System.nanoTime() - t0) / 1e9
          val k = (name, cores)
          best(k) = math.min(best.getOrElse(k, Double.MaxValue), w)
          println(f"[uq] round $r $name%-9s @$cores%2d  $w%7.2f s")
        }
      } finally s.stop()
    }
    for ((name, _) <- variants) {
      val tl = best((name, lo)); val th = best((name, hi))
      val eff = tl / ((hi.toDouble / lo) * th)
      println(f"[uq] BEST $name%-9s t$lo=$tl%7.2f t$hi=$th%7.2f eff=$eff%.3f")
    }
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens

/** Round-5 probe: the fused validation scan became the 32-core bottleneck
  * of the headline suite once the token array was pruned (stage-17 walls
  * 23.2 s @8 → 19.1 s @32 = 0.30 stage efficiency, 3.1× per-core CPU
  * inflation, zero shuffle/spill/GC — BENCH/last_run.json, hunt run).
  * A register loop should scale at the 0.87 ALU-control ceiling, so ONE
  * of the scan's sub-expressions is memory- or port-bound. Time each in
  * isolation over the same generated input at two core counts.
  *
  * Variants (all count() over a filter that keeps ~nothing):
  *   all      — the real fused predicate set (flags + OR filter)
  *   ids      — doc_id string generation only (concat+lpad + isnull)
  *   regex    — doc_id generation + RLIKE
  *   bounds   — token_gen_bounds register loop only (via fused rule)
  *   ntok     — n_tok arithmetic checks only
  *   nothing  — generate orig, count (baseline scan cost)
  */
object RowpassProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(100000000L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(2)
    val only = args.lift(2).map(_.split(',').toSet)
    def session(cores: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    def in(s: SparkSession): DataFrame = SyntheticTokens.synthetic(s, rows, 128)
    val variants: Seq[(String, SparkSession => Long)] = Seq(
      "all" -> { (s: SparkSession) =>
        val d = in(s)
        d.filter(
          col("doc_id").isNull || !col("doc_id").rlike("^doc-[0-9]{12}$") ||
          col("tokens").isNull ||
          graft.functions.exprs.array_int_bounds_violated(col("tokens"), 0, 32767) ||
          col("n_tok").isNull || col("n_tok") < 1 || col("n_tok") > 8192 ||
          col("source").isNull || !(size(col("tokens")) === col("n_tok"))
        ).count()
      },
      "ids" -> { (s: SparkSession) => in(s).filter(col("doc_id").isNull || length(col("doc_id")) =!= 16).count() },
      "regex" -> { (s: SparkSession) => in(s).filter(col("doc_id").isNull || !col("doc_id").rlike("^doc-[0-9]{12}$")).count() },
      "bounds" -> { (s: SparkSession) => in(s).filter(
        graft.functions.exprs.array_int_bounds_violated(col("tokens"), 0, 32767)).count() },
      "ntok" -> { (s: SparkSession) => in(s).filter(col("n_tok") < 1 || col("n_tok") > 8192 ||
        !(size(col("tokens")) === col("n_tok"))).count() },
      "nothing" -> { (s: SparkSession) => in(s).select(col("n_tok")).filter(col("n_tok") > 9000).count() },
      // ref decomposition: the broadcast anti-join measured 13.9 s @32 at
      // 2e8 rows (eff 0.285) while the full fused scan is 6.4 s — split
      // the source-string generation from the join probe
      "src" -> { (s: SparkSession) =>
        in(s).filter(col("source").isNull || length(col("source")) > 64).count() },
      "refjoin" -> { (s: SparkSession) =>
        val dim = s.range(0L, 20L, 1L, 1)
          .select(concat(lit("src"), col("id").cast("string")).as("source"))
        in(s).select(col("source"))
          .join(broadcast(dim), Seq("source"), "left_anti").count() },
      "refjoin_int" -> { (s: SparkSession) =>
        // same join shape with an INTEGER key: isolates string hashing
        val dim = s.range(0L, 20L, 1L, 1).select(col("id").cast("int").as("k"))
        in(s).select(pmod(col("id"), lit(20L)).cast("int").as("k"))
          .join(broadcast(dim), Seq("k"), "left_anti").count() }
    ).filter(v => only.forall(_.contains(v._1)))
    val best = scala.collection.mutable.Map[(String, Int), Double]()
    for (r <- 1 to rounds; cores <- Seq(8, 32)) {
      val s = session(cores)
      variants.foreach { case (n, f) =>
        if (r == 1) f(s) // warmup
        val t0 = System.nanoTime(); f(s); val t = (System.nanoTime() - t0) / 1e9
        val k = (n, cores)
        best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
        System.err.println(f"[rowpass] round=$r cores=$cores $n%-8s ${t}%6.2f s")
      }
      s.stop()
    }
    println(f"[rowpass] === rows=$rows min over $rounds rounds ===")
    println("[rowpass] variant | t8 | t32 | efficiency")
    variants.foreach { case (n, _) =>
      val a = best.getOrElse((n, 8), 0.0); val b = best.getOrElse((n, 32), 0.0)
      println(f"[rowpass] $n%-8s | $a%6.2f | $b%6.2f | ${if (b > 0) a / b / 4 else 0.0}%.3f")
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.functions.exprs
import graft.compile.ConstraintCompiler
import graft.TokenSchema

/** Finer-grained row-pass profiling. */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def synth = SyntheticTokens.synthetic(spark, rows, 64)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p2] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($r)")
    }
    synth.count() // warm
    t("bounds only") {
      synth.filter(exprs.array_int_bounds_violated(col("tokens"), 0, 32767)).count()
    }
    t("size check only") {
      synth.filter(size(col("tokens")) =!= col("n_tok")).count()
    }
    t("regex only") {
      synth.filter(!col("doc_id").rlike("^doc-[0-9]{12}$")).count()
    }
    t("violations array") {
      ConstraintCompiler.withPass(synth, TokenSchema.sequences.rowConstraints)
        .filter(!col("_pass")).count()
    }
    ConstraintCompiler.withPass(synth, TokenSchema.sequences.rowConstraints)
      .filter(!col("_pass")).explain("formatted")
    spark.stop()
  }
}

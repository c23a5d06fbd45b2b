package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.compile.ConstraintCompiler
import graft.unique.SaltedUniqueness
import graft.ref.ReferentialCheck
import graft.TokenSchema

/** Ad-hoc profiling of the bench headline suite components. */
object Profile {
  def timed(name: String)(f: => Any): Unit = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
  }

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
    // warmup
    SyntheticTokens.synthetic(spark, rows / 10, 64).count()
    timed("ids only (no tokens)") {
      spark.range(0L, rows, 1L, 64)
        .select(concat(lit("doc-"), lpad(col("id").cast("string"), 12, "0")).as("doc_id"))
        .count()
    }
    timed("format_string ids") {
      spark.range(0L, rows, 1L, 64)
        .select(format_string("doc-%012d", col("id")).as("doc_id")).count()
    }
    timed("synth full") { synth.count() }
    timed("synth + sum tokens") {
      synth.select(sum(element_at(col("tokens"), 1))).collect()(0)
    }
    timed("row pass") {
      ConstraintCompiler.withPass(synth, TokenSchema.sequences.rowConstraints)
        .filter(!col("_pass")).count()
    }
    timed("unique") { SaltedUniqueness.duplicates(synth, "doc_id").count() }
    timed("ref") {
      val dim = spark.range(0L, 20L, 1L, 1)
        .select(concat(lit("src"), col("id").cast("string")).as("source"))
      ReferentialCheck.orphans(synth, "source", dim, "source").count()
    }
    spark.stop()
  }
}

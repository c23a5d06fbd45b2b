package graft.tools

import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.TokenSchema

object FuseProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.extensions","graft.plans.GraftExtensions")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = SyntheticTokens.synthetic(spark, rows, 64)
    def pass = graft.compile.ConstraintCompiler.withPass(in, TokenSchema.sequences.rowConstraints)
      .filter(!col("_pass"))
    val cnt = pass.groupBy().count()
    val opt = cnt.queryExecution.optimizedPlan.toString
    println("[fuse] count-plan has token_gen_bounds: " + opt.contains("token_gen_bounds"))
    println("[fuse] count-plan has token_array_gen: " + opt.contains("token_array_gen"))
    pass.count() // warm
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val n = pass.count()
      println(f"[fuse] rep$r ${(System.nanoTime()-t0)/1e9}%6.2f s (viol=$n)")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Time individual SparkEntry.queries entries on a testdata dir.
  * Usage: runmain.sh graft.tools.TimeQuery <sfDir> <reps> <name> [name...]
  * Warm-up: one untimed rep per query (session/codegen cost excluded, same
  * as Bench's per-operator protocol).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Queries.partitionSummary(spark, sfDir).count() // session warmup
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // per-query warmup
      (1 to reps).foreach { r =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[time] $name%-24s rep$r ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n rows)")
      }
    }
    spark.stop()
  }
}

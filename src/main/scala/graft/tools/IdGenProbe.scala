package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: format_string vs concat+lpad doc-id generation with the
  * projection FORCED (sum of lengths) — the r1 Profile numbers were
  * meaningless because count() pruned the projection entirely.
  */
object IdGenProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[idgen] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($r)")
    }
    def base = spark.range(0L, rows, 1L, 64)
    // warmup both
    base.select(sum(length(format_string("doc-%012d", col("id"))))).head()
    base.select(sum(length(concat(lit("doc-"), lpad(col("id").cast("string"), 12, "0"))))).head()
    (1 to 3).foreach { _ =>
      timed("format_string")(
        base.select(sum(length(format_string("doc-%012d", col("id"))))).head().getLong(0))
      timed("concat+lpad")(
        base.select(sum(length(concat(lit("doc-"), lpad(col("id").cast("string"), 12, "0"))))).head().getLong(0))
    }
    spark.stop()
  }
}

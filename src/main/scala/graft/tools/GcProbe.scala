package graft.tools

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.run.Validator
import graft.TokenSchema

/** Measures GC share of the headline suite at a given core count. */
object GcProbe {
  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def suite(): Long = {
      val df = SyntheticTokens.synthetic(spark, rows, 64)
      val dim = spark.range(0L, 20L, 1L, 1)
        .select(concat(lit("src"), col("id").cast("string")).as("source"))
      Validator.violations(df, TokenSchema.sequences, "doc_id", Map("sources" -> dim)).count()
    }
    suite() // warm (full size)
    val gc0 = gcMillis; val t0 = System.nanoTime()
    suite()
    val wall = (System.nanoTime() - t0) / 1e9
    val gc = (gcMillis - gc0) / 1000.0
    val cpu = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime
    println(f"[gc] cores=$cores rows=$rows wall=$wall%.2f s gc=$gc%.2f s (${100 * gc / wall}%.0f%%)")
    // rough parallelism: process CPU over the run
    spark.stop()
  }
}

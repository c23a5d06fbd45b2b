package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: verify TaskMetrics shuffle-read/write accumulation via a
  * SparkListener on a job with a known multi-MB shuffle.
  */
object MetricsProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val a = Array.fill(3)(new java.util.concurrent.atomic.AtomicLong())
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          a(0).addAndGet(m.shuffleReadMetrics.totalBytesRead)
          a(1).addAndGet(m.shuffleWriteMetrics.bytesWritten)
          a(2).addAndGet(m.executorCpuTime / 1000000L)
        }
      }
    })
    val n = s.range(0, 5000000L, 1, 16)
      .select(concat(lit("k"), col("id").cast("string")).as("k"))
      .groupBy("k").count().filter(col("count") > 1).count()
    try {
      val bus = s.sparkContext.getClass.getMethod("listenerBus").invoke(s.sparkContext)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case e: Throwable => println(s"drain failed: $e"); Thread.sleep(1000) }
    println(s"[probe] result=$n shufRead=${a(0).get} shufWrite=${a(1).get} cpuMs=${a(2).get}")
    s.stop()
  }
}

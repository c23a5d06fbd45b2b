package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Queries

/** r6 dev probe: per-stage wall/task breakdown of the residual-hot queries
  * (bench-parity session), via a stage listener.
  */
object R06Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), wall, si.numTasks))
      }
    })

    def mat(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def probe(name: String)(f: => Unit): Unit = {
      // warmup rep first (janino/JIT), then measured rep with stage capture
      f; s.catalog.clearCache()
      stages.clear()
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      s.catalog.clearCache()
      Thread.sleep(200)
      println(f"[r6] ==== $name total $wall%.2f s, ${stages.size} stages ====")
      stages.foreach { case (id, n, w, t) => println(f"[r6]   stage $id%3d $w%6d ms $t%3d tasks  $n") }
    }

    probe("dedup_containment") { mat(Queries.dedupContainment(s, dir)) }
    probe("span_trim") { mat(Queries.spanTrim(s, dir)) }
    s.stop()
  }
}

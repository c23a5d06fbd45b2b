package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.run.Validator
import graft.TokenSchema

/** Stage-level attribution of the headline suite: per-stage wall, total
  * executor task time, and shuffle bytes — pinpoints serial bottlenecks.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val shufParts = sys.env.get("SP_SHUF_ABS").map(_.toInt).getOrElse(cores)
    val spark = SparkSession.builder()
      .master(s"local[$cores,4]")
      .config("spark.sql.shuffle.partitions", shufParts.toString)
      // match Bench.session's protocol configs: no byte-based coalescing of
      // the pinned reducer count, and no 120 s heartbeat fuse (G1 heap
      // expansion on this host stalls all threads past it — see Bench)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.executor.heartbeat.maxFailures", "600")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.Map[Int, (String, Long, Long, Long, Long, Long, Long, Long, Long)]() // name, wall, taskTime, cpuTime, gcTime, tasks, shuffleW, shuffleR, spill
    spark.sparkContext.addSparkListener(new SparkListener {
      private val t0 = mutable.Map[Int, Long]()
      private val taskTime = mutable.Map[Int, Long]()
      private val cpuTime = mutable.Map[Int, Long]()
      private val gcTime = mutable.Map[Int, Long]()
      private val shuffleW = mutable.Map[Int, Long]()
      private val shuffleR = mutable.Map[Int, Long]()
      private val spill = mutable.Map[Int, Long]()
      private val nTasks = mutable.Map[Int, Long]()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        t0(s.stageInfo.stageId) = System.nanoTime()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        taskTime(t.stageId) = taskTime.getOrElse(t.stageId, 0L) + t.taskMetrics.executorRunTime
        cpuTime(t.stageId) = cpuTime.getOrElse(t.stageId, 0L) +
          t.taskMetrics.executorCpuTime / 1000000L
        gcTime(t.stageId) = gcTime.getOrElse(t.stageId, 0L) + t.taskMetrics.jvmGCTime
        shuffleW(t.stageId) = shuffleW.getOrElse(t.stageId, 0L) +
          t.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleR(t.stageId) = shuffleR.getOrElse(t.stageId, 0L) +
          t.taskMetrics.shuffleReadMetrics.totalBytesRead
        spill(t.stageId) = spill.getOrElse(t.stageId, 0L) +
          t.taskMetrics.memoryBytesSpilled
        nTasks(t.stageId) = nTasks.getOrElse(t.stageId, 0L) + 1
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val id = s.stageInfo.stageId
        val wall = (System.nanoTime() - t0.getOrElse(id, System.nanoTime())) / 1000000L
        // RDD lineage names identify the operators far better than the
        // callsite (always a SQL-execution thread-pool frame)
        val rdds = s.stageInfo.rddInfos.sortBy(_.id).map(_.name).distinct.mkString(">")
        stages(id) = (rdds.take(80), wall, taskTime.getOrElse(id, 0L),
          cpuTime.getOrElse(id, 0L), gcTime.getOrElse(id, 0L),
          nTasks.getOrElse(id, 0L), shuffleW.getOrElse(id, 0L), shuffleR.getOrElse(id, 0L),
          spill.getOrElse(id, 0L))
      }
    })

    val parquetPath = sys.env.get("SP_PARQUET")
    val nTokMod = sys.env.get("SP_NTOKMOD").map(_.toLong)
      .getOrElse(SyntheticTokens.NTokMod)
    val inputParts = sys.env.get("SP_INPUT_PARTS").map(_.toInt).getOrElse(64)
    def input = parquetPath.map(spark.read.parquet(_))
      .getOrElse(SyntheticTokens.synthetic(spark, rows, inputParts, nTokMod))
    val mode = args.lift(3).getOrElse("suite")
    def suite(): Long = mode match {
      case "scan" => input.select(sum(element_at(col("tokens"), 1))).head().getLong(0)
      case "rowpass" =>
        graft.compile.ConstraintCompiler.withPass(input, TokenSchema.sequences.rowConstraints)
          .filter(!col("_pass")).count()
      case "unique" => graft.unique.SaltedUniqueness.duplicates(input, "doc_id").count()
      case "ref" =>
        val dim = spark.range(0L, 20L, 1L, 1)
          .select(concat(lit("src"), col("id").cast("string")).as("source"))
        graft.ref.ReferentialCheck.orphans(input, "source", dim, "source").count()
      case _ =>
        val dim = spark.range(0L, 20L, 1L, 1)
          .select(concat(lit("src"), col("id").cast("string")).as("source"))
        Validator.violations(input, TokenSchema.sequences, "doc_id", Map("sources" -> dim)).count()
    }
    (1 to reps).foreach { r =>
      stages.clear()
      spark.catalog.clearCache() // gated uniqueness persists its dup-hash set
      val t0 = System.nanoTime()
      suite()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[sp] === rep $r wall=$wall%.2f s (cores=$cores rows=$rows)")
      stages.toSeq.sortBy(_._1).foreach { case (id, (name, w, tt, ct, gt, nt, sw, sr, sp)) =>
        println(f"[sp] stage $id%3d wall=${w / 1000.0}%7.2f s taskTime=${tt / 1000.0}%8.2f s cpu=${ct / 1000.0}%8.2f s gc=${gt / 1000.0}%7.2f s tasks=$nt%3d shufW=${sw / 1e6}%8.1f MB shufR=${sr / 1e6}%8.1f MB spill=${sp / 1e6}%8.1f MB  $name")
      }
    }
    spark.stop()
  }
}

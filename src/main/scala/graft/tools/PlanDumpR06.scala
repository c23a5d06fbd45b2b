package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.SparkEntry

/** Round-6 optimization evidence: writes `plans/r06/<query>_<suffix>.txt`
  * with the formatted physical plan of each named query, under the SAME
  * session configuration Bench.scala uses for the per-operator suite
  * (local[32], shuffle.partitions=32, AQE on, GraftExtensions), so the
  * committed plans are the plans the bench actually executes.
  *
  * Usage: runMain graft.tools.PlanDumpR06 <suffix> [query,query,...]
  * (no list = every declared query).
  */
object PlanDumpR06 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val only: Option[Set[String]] =
      args.drop(1).headOption.map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def planOf(df: DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(out) { df.explain("formatted") }
      out.toString
    }

    Files.createDirectories(Paths.get("plans/r06"))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val p = planOf(fn(spark, dir))
          Files.writeString(Paths.get(s"plans/r06/${name}_$suffix.txt"), p)
          println(s"[plans] $name -> plans/r06/${name}_$suffix.txt")
        } catch {
          case e: Throwable => println(s"[plans] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}

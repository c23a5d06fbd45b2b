package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: runs SparkEntry.entry exactly as the driver does
  * (rows > 0 check) and prints the count + a sample.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    df.orderBy("constraint_id", "doc_id").show(10, truncate = false)
    require(n > 0, "entry returned 0 rows")
    println("[smoke] OK")
    spark.stop()
  }
}

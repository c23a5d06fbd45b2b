package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Knn

/** Dev tool: measure ANN recall vs exact kNN for nbits/radius combinations
  * on the driver test data (evidence for the sim_ann_lsh oracle choice).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.filter(col("vec_id") < 10)
      val exact = Knn.cosineTopK(e, q, "vec_id", "embedding", 5)
        .select("qid", "rank", "neighbor").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      for (nbits <- Seq(8, 12, 16); radius <- Seq(1, 2)) {
        val t0 = System.nanoTime()
        val ann = Knn.lshTopK(e, q, "vec_id", "embedding", 5, nbits, radius)
          .select("qid", "rank", "neighbor").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val hit = exact.intersect(ann).size
        println(f"$dir nbits=$nbits radius=$radius: exact-matched $hit/${exact.size} " +
          f"ann=${ann.size} wall=$dt%.2fs")
      }
    }
    spark.stop()
  }
}

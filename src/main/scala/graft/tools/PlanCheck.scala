package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.run.Validator
import graft.TokenSchema
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dim = s.range(0L, 20L, 1L, 1)
      .select(concat(lit("src"), col("id").cast("string")).as("source"))
    val v = Validator.violations(SyntheticTokens.synthetic(s, 1000L, 4),
      TokenSchema.sequences, "doc_id", Map("sources" -> dim))
    val opt = v.queryExecution.optimizedPlan.toString
    println("union children heads:")
    opt.split("\n").filter(l => l.startsWith(":- ") || l.startsWith("+- ") || l.startsWith("Union"))
      .foreach(l => println("  " + l.take(120)))
    s.stop()
  }
}

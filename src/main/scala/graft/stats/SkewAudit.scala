package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew audit: profile a prospective shuffle key BEFORE the expensive
  * job runs, and emit the salting plan a skewed key needs.
  *
  * Every large join/groupBy stands or falls on its key distribution — a
  * single hot key turns a 1000-executor shuffle into one straggler task.
  * This pass answers, in one aggregation: how many keys, how heavy is the
  * head, and how many salt buckets would spread each heavy key to the
  * average partition load (`salt = ceil(cnt · parts / total)` — 1 means
  * "no salting needed").
  *
  * All arithmetic is integer (DIV), so the report is bit-identical across
  * engines and partitionings. Scale shape: one map-side-combined
  * groupBy(key) — the only full shuffle — then a TakeOrdered top-N
  * (deterministic tiebreak on key) and a 1-row crossJoin for the totals;
  * output is bounded by topN, never key cardinality.
  */
object SkewAudit {

  def keySkew(df: DataFrame, keyCol: String, topN: Int, parts: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).cast("long").as("total"),
      count(lit(1)).as("nkeys"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topN)
      .crossJoin(totals) // topN rows × 1 totals row
      .select(col("key"), col("cnt"),
        expr("cnt * 1000000L DIV total").as("ppm"),
        expr(s"(cnt * ${parts}L + total - 1L) DIV total").as("salt"),
        col("total"), col("nkeys"))
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.io.TableIO
import graft.run.IncrementalRunner

/** End-to-end resume (SURVEY §5.6): interrupted run + resume produces
  * byte-identical sinks to an uninterrupted run, recomputing ONLY the
  * missing partitions; a third run is a no-op.
  */
class ResumeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def mkRunner(base: String) = IncrementalRunner(
    TableIO(spark), TokenSchema.sequences, "doc_id", "source",
    s"$base/violations", s"$base/summary", s"$base/checkpoint")

  private def canon(path: String): Seq[String] =
    spark.read.parquet(path)
      .select(col("source"), col("doc_id"), col("constraint_id"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("interrupted + resumed run ≡ single full run; re-run is a no-op") {
    val docs = SyntheticTokens.readDocuments(spark, dir)
    val input = SyntheticTokens.dirty(docs)
    val dims = Map("sources" -> SyntheticTokens.sourcesDim(docs))
    val full = Files.createTempDirectory("graft_full").toString
    val part = Files.createTempDirectory("graft_part").toString

    // reference: uninterrupted run (20 sources + the planted '__unknown__')
    val rFull = mkRunner(full).run(input, dims, "run-full")
    assert(rFull.processedPartitions.size === 21)

    // interrupted: first run sees only half the partitions' data
    val half = (0 until 10).map(i => s"src$i")
    val firstHalf = input.filter(col("source").isin(half: _*))
    val r1 = mkRunner(part).run(firstHalf, dims, "run-1")
    assert(r1.processedPartitions.size === 10)

    // resume over the FULL input: only the missing 11 partitions process
    val r2 = mkRunner(part).run(input, dims, "run-2")
    assert(r2.processedPartitions.size === 11)
    assert(r1.processedPartitions.toSet.intersect(r2.processedPartitions.toSet).isEmpty)

    // sinks identical to the uninterrupted run
    assert(canon(s"$part/violations") === canon(s"$full/violations"))
    val sumFull = spark.read.parquet(s"$full/summary")
      .orderBy("source").collect().map(_.mkString("|")).toSeq
    val sumPart = spark.read.parquet(s"$part/summary")
      .orderBy("source").collect().map(_.mkString("|")).toSeq
    assert(sumPart === sumFull)

    // third run: nothing left
    val r3 = mkRunner(part).run(input, dims, "run-3")
    assert(r3.processedPartitions.isEmpty)

    // checkpoint carries metrics + lineage per partition
    val ckpt = spark.read.parquet(s"$part/checkpoint")
    assert(ckpt.count() === 21)
    assert(ckpt.filter(col("metrics_json").isNull || col("lineage_json").isNull).count() === 0)
    val totalRows = ckpt
      .select(get_json_object(col("metrics_json"), "$.rows").cast("long").as("r"))
      .agg(sum(col("r"))).head().getLong(0)
    assert(totalRows === 500L) // per-partition metrics cover every input row
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.run.Validator

/** Golden end-to-end over the planted-violation table (sf0.001):
  * the expected violation multiset is closed-form (FIXTURES.md §1).
  */
class ValidatorSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("flagship violation counts match the closed-form plant exactly") {
    val byId = Queries.flagshipViolations(spark, dir)
      .groupBy("constraint_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byId === Map(
      "required_doc_id" -> 10L,    // cls 1
      "range_n_tok" -> 20L,        // cls 4 + 5
      "size_consistent" -> 20L,    // cls 4 + 5
      "array_elem_tokens" -> 10L,  // cls 6
      "unique_doc_id" -> 2L,       // dup key + hot key
      "ref_integrity_source" -> 10L)) // cls 3
  }

  test("clean table passes the full suite with zero violations") {
    val docs = SyntheticTokens.readDocuments(spark, dir)
    val v = Validator.violations(SyntheticTokens.clean(docs), TokenSchema.sequences,
      "doc_id", Map("sources" -> SyntheticTokens.sourcesDim(docs)))
    assert(v.count() === 0L)
  }

  test("summary rollup: total row aggregates all sources and fails on dirty data") {
    val s = Validator.summary(SyntheticTokens.dirtyFrom(spark, dir), TokenSchema.sequences, "source")
    val total = s.filter(col("source").isNull).head()
    assert(total.getAs[Long]("rows") === 500L)
    assert(total.getAs[Long]("violation_count") === 60L)
    assert(!total.getAs[Boolean]("pass"))
    // clean data passes everywhere
    val sc = Validator.summary(SyntheticTokens.cleanFrom(spark, dir), TokenSchema.sequences, "source")
    assert(sc.filter(!col("pass")).count() === 0L)
  }

  test("synthesis is permutation/partition invariant (hash-seeded, no RNG)") {
    val docs = SyntheticTokens.readDocuments(spark, dir)
    val a = SyntheticTokens.clean(docs.repartition(13))
      .agg(sum(crc32(to_json(struct(col("doc_id"), col("tokens"), col("n_tok"))))))
      .head().getLong(0)
    val b = SyntheticTokens.clean(docs.orderBy(desc("doc_id")).repartition(3))
      .agg(sum(crc32(to_json(struct(col("doc_id"), col("tokens"), col("n_tok"))))))
      .head().getLong(0)
    assert(a === b)
  }
}

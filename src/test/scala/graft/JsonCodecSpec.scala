package graft

import org.apache.spark.sql.functions._
import graft.json.JsonCodec
import graft.schema._

/** JSON round-trip + registry dispatch (reference E2/E3 semantics). */
class JsonCodecSpec extends SparkTestBase {

  import spark.implicits._

  private val rec = RecordSchema("RtRec", Seq(
    FieldSpec("id", IntT(8), required = true),
    FieldSpec("name", TextT),
    FieldSpec("tags", ListT(IntT(4)))))

  test("dumps → loads round-trips values including nulls and arrays") {
    val df = Seq(
      (1L, "alpha", Seq(1, 2, 3)),
      (2L, null, Seq.empty[Int]),
      (3L, "quote\"and\\slash", Seq(7))
    ).toDF("id", "name", "tags")
    val back = df.withColumn("js", JsonCodec.dumps(df, rec))
      .withColumn("rec", JsonCodec.loadsAs(col("js"), rec))
    val bad = back.filter(
      !(col("rec.id") <=> col("id")) ||
      !(col("rec.name") <=> col("name")) ||
      !(col("rec.tags") <=> col("tags")))
    assert(bad.count() === 0L)
  }

  test("dumps embeds the $record_name discriminator first") {
    val df = Seq((1L, "x", Seq(1))).toDF("id", "name", "tags")
    val js = df.select(JsonCodec.dumps(df, rec).as("js")).head().getString(0)
    assert(js.startsWith("""{"$record_name":"RtRec""""))
  }

  test("dispatch routes by record name; unknown names become violations, not exceptions") {
    RecordSchema("DispA", Seq(FieldSpec("id", IntT(8))))
    RecordSchema("DispB", Seq(FieldSpec("id", IntT(8))))
    val payloads = Seq(
      """{"$record_name":"DispA","id":1}""",
      """{"$record_name":"DispA","id":2}""",
      """{"$record_name":"DispB","id":3}""",
      """{"$record_name":"Nope","id":4}""",
      """not json at all"""
    ).toDF("payload")
    val (parsed, unknown) = JsonCodec.dispatch(payloads, "payload", Seq("DispA", "DispB"))
    assert(parsed("DispA").count() === 2L)
    assert(parsed("DispB").count() === 1L)
    assert(unknown.count() === 2L)
    assert(unknown.select("constraint_id").distinct().head().getString(0) === "schema_dispatch")
  }

  test("SchemaRegistry: auto-registration and opt-out") {
    val before = SchemaRegistry.contains("OptOutRec")
    RecordSchema("OptOutRec", Seq(FieldSpec("id", IntT(8))), autoRegister = false)
    assert(!before && !SchemaRegistry.contains("OptOutRec"))
    assert(SchemaRegistry.contains("RtRec"))
    assert(SchemaRegistry.lookup("RtRec").get.fieldNames === Seq("id", "name", "tags"))
  }
}

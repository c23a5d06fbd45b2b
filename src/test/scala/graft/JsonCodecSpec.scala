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

  test("Avro-JSON encoding wraps nullable unions, keeps required fields plain") {
    import graft.json.AvroJsonCodec
    val sch = RecordSchema("AvroRec", Seq(
      FieldSpec("id", IntT(8), required = true),
      FieldSpec("name", TextT),
      FieldSpec("n", IntT(4)),
      FieldSpec("xs", ListT(IntT(4)), required = true)), autoRegister = false)
    val df = Seq(
      (1L, "a", Some(7), Seq(1, 2)),
      (2L, null, None: Option[Int], Seq.empty[Int])
    ).toDF("id", "name", "n", "xs")
    val out = df.select(AvroJsonCodec.avroDumps(sch).as("j")).orderBy(col("j")).collect().map(_.getString(0))
    assert(out(0) === """{"id":1,"name":{"string":"a"},"n":{"int":7},"xs":[1,2]}""")
    assert(out(1) === """{"id":2,"name":null,"n":null,"xs":[]}""")
  }

  test("Avro-JSON round-trips dates, bytes (base64), timestamps and sub-records") {
    import graft.json.AvroJsonCodec
    val meta = RecordSchema("AvMeta", Seq(
      FieldSpec("origin", TextT, required = true),
      FieldSpec("rating", IntT(8))), autoRegister = false)
    val sch = RecordSchema("AvFull", Seq(
      FieldSpec("id", IntT(8), required = true),
      FieldSpec("d", DateT),
      FieldSpec("ts", DateTimeT),
      FieldSpec("b", BytesT),
      FieldSpec("m", SubRecordT(meta))), autoRegister = false)
    val df = Seq(
      (1L, java.sql.Date.valueOf("2020-06-15"),
        java.sql.Timestamp.valueOf("2020-06-15 12:34:56.789"),
        Array[Byte](1, 2, 3), ("web", 4L)),
      (2L, null.asInstanceOf[java.sql.Date], null.asInstanceOf[java.sql.Timestamp],
        null.asInstanceOf[Array[Byte]], null.asInstanceOf[(String, Long)])
    ).toDF("id", "d", "ts", "b", "m")
      .withColumn("m", when(col("m").isNotNull,
        struct(col("m._1").as("origin"), col("m._2").as("rating"))))
    val back = df.withColumn("j", AvroJsonCodec.avroDumps(sch))
      .withColumn("r", AvroJsonCodec.avroLoads(col("j"), sch))
    val bad = back.filter(
      !(col("r.id") <=> col("id")) || !(col("r.d") <=> col("d")) ||
      !(col("r.ts") <=> col("ts")) || !(col("r.b") <=> col("b")) ||
      !(col("r.m") <=> col("m")))
    assert(bad.count() === 0L)
    // date union branch is the Avro underlying primitive, days-since-epoch
    val j = back.filter(col("id") === 1L).select("j").head().getString(0)
    assert(j.contains(""""d":{"int":18428}"""), j)
    assert(j.contains(""""b":{"bytes":"AQID"}"""), j)
    assert(j.contains(""""m":{"AvMeta":{"origin":"web","rating":{"long":4}}}"""), j)
  }

  test("SchemaRegistry: auto-registration and opt-out") {
    val before = SchemaRegistry.contains("OptOutRec")
    RecordSchema("OptOutRec", Seq(FieldSpec("id", IntT(8))), autoRegister = false)
    assert(!before && !SchemaRegistry.contains("OptOutRec"))
    assert(SchemaRegistry.contains("RtRec"))
    assert(SchemaRegistry.lookup("RtRec").get.fieldNames === Seq("id", "name", "tags"))
  }
}

package graft

import graft.schema._

/** Golden schema-projection tests (reference R16/R19/R20 semantics). */
class RendersSpec extends SparkTestBase {

  private val rec = RecordSchema("Golden", Seq(
    FieldSpec("id", IntT(8), required = true),
    FieldSpec("name", TextT),
    FieldSpec("kind", EnumT(Seq("web", "pdf"))),
    FieldSpec("score", FloatT(4)),
    FieldSpec("small", IntT(2)),
    FieldSpec("tags", ListT(IntT(4)), required = true),
    FieldSpec("attrs", MapT(TextT))),
    autoRegister = false)

  test("Avro render: nullable → union with null, size → int/long width") {
    val avro = Renders.avroSchema(rec)
    assert(avro.contains(""""name":"id","type":"long""""))
    assert(avro.contains("""{"name":"name","type":["null","string"],"default":null}"""))
    assert(avro.contains(""""name":"small","type":["null","int"]"""))
    assert(avro.contains(""""name":"score","type":["null","float"]"""))
    assert(avro.contains("""{"name":"tags","type":{"type":"array","items":"int"}}"""))
    assert(avro.contains(""""type":"map","values":"string""""))
    // must be valid JSON
    assert(ujsonLike(avro))
  }

  test("JSON Schema render: enum values, required list") {
    val js = Renders.jsonSchema(rec)
    assert(js.contains(""""kind":{"type":"string","enum":["web","pdf"]}"""))
    assert(js.contains(""""required":["id","tags"]"""))
    assert(ujsonLike(js))
  }

  test("Postgres DDL render: width mapping + NOT NULL") {
    val ddl = Renders.postgresDdl(rec)
    assert(ddl.contains("id bigint NOT NULL"))
    assert(ddl.contains("small smallint"))
    assert(ddl.contains("score real"))
    assert(ddl.contains("tags integer[] NOT NULL"))
    assert(ddl.contains("attrs jsonb"))
  }

  test("Iceberg DDL render: type mapping, NOT NULL, partition transforms, v2") {
    val ddl = Renders.icebergDdl(rec, Seq("bucket(128, id)", "kind"))
    assert(ddl.contains("id BIGINT NOT NULL"))
    assert(ddl.contains("small SMALLINT"))
    assert(ddl.contains("score FLOAT"))
    assert(ddl.contains("tags ARRAY<INT> NOT NULL"))
    assert(ddl.contains("attrs MAP<STRING, STRING>"))
    assert(ddl.contains("USING iceberg"))
    assert(ddl.contains("PARTITIONED BY (bucket(128, id), kind)"))
    assert(ddl.contains("'format-version' = '2'"))
    // the engine's own table schema renders and names every north-rule column
    val seq = Renders.icebergDdl(TokenSchema.sequences, Seq("bucket(128, doc_id)"))
    assert(seq.contains("doc_id STRING NOT NULL"))
    assert(seq.contains("tokens ARRAY<INT> NOT NULL"))
    assert(seq.contains("n_tok INT NOT NULL"))
    assert(seq.contains("source STRING NOT NULL"))
  }

  test("StructType inference round-trips through a real parquet footer") {
    val st = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").schema
    val inferred = Renders.fromStructType("Document2", st)
    assert(inferred.fieldNames === Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(inferred.field("doc_id").ftype === IntT(8))
    assert(inferred.field("text").ftype === TextT)
    assert(inferred.structType === st)
  }

  /** Cheap JSON validity check via Spark's own parser. */
  private def ujsonLike(s: String): Boolean = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Seq(s).toDF("j").select(get_json_object(col("j"), "$").isNotNull).head().getBoolean(0)
  }
}

package graft.schema

import org.apache.spark.sql.types._

/** Schema projections — the engine analogue of the reference's extension
  * renderers (pyschema_extensions/avro.py, jsonschema.py, postgres.py —
  * SURVEY §2.1 R16, R19, R20). Pure metadata string generators: the
  * sandbox ships no spark-avro connector (SURVEY §7.5), so the Avro render
  * is a schema-JSON generator, not a data path.
  *
  * Conventions mirrored from the reference:
  *  - nullable fields render as Avro union ["null", T] (R16);
  *  - Integer size maps to int/long (Avro) and smallint/int/bigint
  *    (Postgres) (R14, R20);
  *  - field order = declaration order (R2).
  */
object Renders {

  // ---------- Avro ----------

  private def avroPrimitive(ft: FType): String = ft match {
    case TextT        => "\"string\""
    case BytesT       => "\"bytes\""
    case IntT(s)      => if (s <= 4) "\"int\"" else "\"long\""
    case FloatT(s)    => if (s == 4) "\"float\"" else "\"double\""
    case BoolT        => "\"boolean\""
    case EnumT(_)     => "\"string\""
    case DateT        => "{\"type\":\"int\",\"logicalType\":\"date\"}"
    case DateTimeT    => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
    case lt: ListT    => s"""{"type":"array","items":${avroPrimitive(lt.elem)}}"""
    case mt: MapT     => s"""{"type":"map","values":${avroPrimitive(mt.value)}}"""
    case SubRecordT(s) => avroSchema(s)
  }

  def avroField(f: FieldSpec): String = {
    val base = avroPrimitive(f.ftype)
    val t = if (f.required) base else s"""["null",$base]"""
    val default = if (f.required) "" else ",\"default\":null"
    s"""{"name":"${f.name}","type":$t$default}"""
  }

  def avroSchema(s: RecordSchema): String =
    s"""{"type":"record","name":"${s.name}","fields":[${s.fields.map(avroField).mkString(",")}]}"""

  // ---------- JSON Schema ----------

  private def jsonSchemaType(ft: FType): String = ft match {
    case TextT     => """{"type":"string"}"""
    case BytesT    => """{"type":"string","contentEncoding":"base64"}"""
    case IntT(_)   => """{"type":"integer"}"""
    case FloatT(_) => """{"type":"number"}"""
    case BoolT     => """{"type":"boolean"}"""
    case EnumT(vs) => s"""{"type":"string","enum":[${vs.map(v => s""""$v"""").mkString(",")}]}"""
    case DateT     => """{"type":"string","format":"date"}"""
    case DateTimeT => """{"type":"string","format":"date-time"}"""
    case lt: ListT => s"""{"type":"array","items":${jsonSchemaType(lt.elem)}}"""
    case mt: MapT  => s"""{"type":"object","additionalProperties":${jsonSchemaType(mt.value)}}"""
    case SubRecordT(sub) => jsonSchema(sub)
  }

  def jsonSchema(s: RecordSchema): String = {
    val props = s.fields.map(f => s""""${f.name}":${jsonSchemaType(f.ftype)}""").mkString(",")
    val req = s.fields.filter(_.required).map(f => s""""${f.name}"""").mkString(",")
    s"""{"type":"object","title":"${s.name}","properties":{$props},"required":[$req]}"""
  }

  // ---------- Postgres DDL ----------

  private def pgType(ft: FType): String = ft match {
    case TextT     => "text"
    case BytesT    => "bytea"
    case IntT(2)   => "smallint"
    case IntT(4)   => "integer"
    case IntT(_)   => "bigint"
    case FloatT(4) => "real"
    case FloatT(_) => "double precision"
    case BoolT     => "boolean"
    case EnumT(_)  => "text"
    case DateT     => "date"
    case DateTimeT => "timestamp"
    case lt: ListT => s"${pgType(lt.elem)}[]"
    case _: MapT | _: SubRecordT => "jsonb"
  }

  def postgresDdl(s: RecordSchema): String = {
    val cols = s.fields.map { f =>
      val nn = if (f.required) " NOT NULL" else ""
      s"  ${f.name} ${pgType(f.ftype)}$nn"
    }
    s"""CREATE TABLE ${s.name.toLowerCase} (\n${cols.mkString(",\n")}\n);"""
  }

  // ---------- Spark SQL / Iceberg DDL ----------

  private def sparkType(ft: FType): String = ft match {
    case TextT     => "STRING"
    case BytesT    => "BINARY"
    case IntT(2)   => "SMALLINT"
    case IntT(4)   => "INT"
    case IntT(_)   => "BIGINT"
    case FloatT(4) => "FLOAT"
    case FloatT(_) => "DOUBLE"
    case BoolT     => "BOOLEAN"
    case EnumT(_)  => "STRING"
    case DateT     => "DATE"
    case DateTimeT => "TIMESTAMP"
    case lt: ListT => s"ARRAY<${sparkType(lt.elem)}>"
    case mt: MapT  => s"MAP<STRING, ${sparkType(mt.value)}>"
    case sr: SubRecordT =>
      sr.schema.fields.map(f => s"${f.name}: ${sparkType(f.ftype)}")
        .mkString("STRUCT<", ", ", ">")
  }

  /** Iceberg table DDL for the declared schema — the lakehouse layout the
    * north rule targets (BASELINE.json: "Iceberg table of pre-tokenized
    * training sequences"). `partitionedBy` takes Iceberg partition
    * TRANSFORMS verbatim (`bucket(128, doc_id)`, `days(ts)`, a plain
    * column name): bucketing the id key is what makes the uniqueness
    * check's shuffle co-located and the metadata-driven partition pruning
    * of the resume path possible. format-version 2 for row-level deletes
    * (the CDC MERGE path, rel/MergeInto); required fields render NOT NULL
    * so the table enforces the cheapest constraint class at write time —
    * the validator still audits it (belt and braces: a reader can't trust
    * every historical writer honored the DDL).
    */
  def icebergDdl(s: RecordSchema, partitionedBy: Seq[String] = Nil): String = {
    val cols = s.fields.map { f =>
      val nn = if (f.required) " NOT NULL" else ""
      s"  ${f.name} ${sparkType(f.ftype)}$nn"
    }
    val part =
      if (partitionedBy.isEmpty) ""
      else partitionedBy.mkString("\nPARTITIONED BY (", ", ", ")")
    s"""CREATE TABLE ${s.name.toLowerCase} (
       |${cols.mkString(",\n")}
       |)
       |USING iceberg$part
       |TBLPROPERTIES ('format-version' = '2')""".stripMargin
  }

  // ---------- inverse: StructType → RecordSchema ----------

  /** Engine analogue of avro_to_pyschema (R18): infer a RecordSchema from
    * any Spark StructType (e.g. read from parquet footers), so existing
    * tables get a declared schema + constraint surface without hand-typing.
    */
  def fromStructType(name: String, st: StructType): RecordSchema = {
    def ft(dt: DataType): FType = dt match {
      case StringType => TextT
      case BinaryType => BytesT
      case ShortType => IntT(2)
      case IntegerType => IntT(4)
      case LongType => IntT(8)
      case FloatType => FloatT(4)
      case DoubleType => FloatT(8)
      case BooleanType => BoolT
      case DateType => DateT
      case TimestampType | TimestampNTZType => DateTimeT
      case ArrayType(e, n) => ListT(ft(e), containsNull = n)
      case MapType(StringType, v, _) => MapT(ft(v))
      case s: StructType => SubRecordT(fromStructType(s"${name}_sub", s))
      case other => sys.error(s"unsupported type $other")
    }
    RecordSchema(name,
      st.fields.toSeq.map(f => FieldSpec(f.name, ft(f.dataType), required = !f.nullable)),
      autoRegister = false)
  }
}

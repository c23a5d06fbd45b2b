package graft.json

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema._

/** Avro-JSON data encoding — the engine analogue of the reference's
  * avro_dump/avro_load mixins (pyschema_extensions/avro.py [U]; SURVEY §2.1
  * R17, the one reference behavior with no engine analogue in round 1).
  *
  * Avro's JSON encoding wraps every union-typed value in a single-key
  * object naming the branch: a nullable string "x" encodes as
  * `{"string":"x"}`, null as `null`. The reference renders every
  * non-required field as the union `["null", T]` (Renders.avroField), so
  * exactly those fields are wrapped here; required fields encode plainly.
  * Branch names follow the Avro spec: primitive-type name for primitives,
  * the underlying primitive for logical types (date → "int",
  * timestamp-micros → "long"), `"array"`/`"map"` for containers, and the
  * record name for sub-records.
  *
  * Divergence (documented, sandbox-forced): Avro-JSON encodes `bytes` as an
  * ISO-8859-1 codepoint-escaped string, which `to_json` cannot emit; the
  * engine keeps its JSON-path convention of base64 (JsonCodec / SURVEY
  * §1.2). Everything is pure Catalyst columns — one `to_json`/`from_json`
  * per record, no UDFs, fully codegen'd.
  */
object AvroJsonCodec {

  /** Avro union-branch key for a field type. */
  def branchName(ft: FType): String = ft match {
    case TextT | EnumT(_) => "string"
    case BytesT           => "bytes"
    case IntT(s)          => if (s <= 4) "int" else "long"
    case FloatT(s)        => if (s == 4) "float" else "double"
    case BoolT            => "boolean"
    case DateT            => "int"    // logicalType date → underlying int
    case DateTimeT        => "long"   // timestamp-micros → underlying long
    case _: ListT         => "array"
    case _: MapT          => "map"
    case SubRecordT(s)    => s.name
  }

  /** Encode one value to its Avro-JSON-compatible column (pre-wrapping). */
  private def encodeValue(c: Column, ft: FType): Column = ft match {
    case BytesT        => base64(c)
    case DateT         => datediff(c, to_date(lit("1970-01-01"))) // days since epoch
    case DateTimeT     => unix_micros(c)
    case SubRecordT(s) => struct(s.fields.map(f => encodeField(c(f.name), f)): _*)
    case lt: ListT     => lt.elem match {
      case BytesT | DateT | DateTimeT | _: SubRecordT =>
        transform(c, e => encodeValue(e, lt.elem))
      case _ => c
    }
    case mt: MapT      => mt.value match {
      case BytesT | DateT | DateTimeT | _: SubRecordT =>
        map_from_arrays(map_keys(c), transform(map_values(c), e => encodeValue(e, mt.value)))
      case _ => c
    }
    case _             => c
  }

  /** Union-wrap when the field renders as ["null", T] (non-required). */
  private def encodeField(c: Column, f: FieldSpec): Column = {
    val enc = encodeValue(c, f.ftype)
    val v = if (f.required) enc
            else when(c.isNotNull, struct(enc.as(branchName(f.ftype))))
    v.as(f.name)
  }

  /** avro_dump: one Avro-JSON string column for the whole record. Field
    * order = declaration order (R2). `ignoreNullFields=false` so null
    * unions serialize as explicit `null` (the Avro-JSON form), not as
    * omitted keys.
    */
  def avroDumps(schema: RecordSchema): Column =
    to_json(struct(schema.fields.map(f => encodeField(col(f.name), f)): _*),
      Map("ignoreNullFields" -> "false"))

  // ---------- inverse ----------

  private def encodedDataType(ft: FType): DataType = ft match {
    case BytesT        => StringType // base64
    case DateT         => IntegerType
    case DateTimeT     => LongType
    case SubRecordT(s) => wrappedStructType(s)
    case lt: ListT     => ArrayType(encodedDataType(lt.elem), lt.containsNull)
    case mt: MapT      => MapType(StringType, encodedDataType(mt.value), valueContainsNull = true)
    case other         => other.dataType
  }

  private def wrappedFieldType(f: FieldSpec): DataType = {
    val base = encodedDataType(f.ftype)
    if (f.required) base
    else StructType(Seq(StructField(branchName(f.ftype), base, nullable = true)))
  }

  /** The StructType an Avro-JSON string parses to (unions as one-field
    * structs).
    */
  def wrappedStructType(schema: RecordSchema): StructType =
    StructType(schema.fields.map(f =>
      StructField(f.name, wrappedFieldType(f), nullable = !f.required)))

  private def decodeValue(c: Column, ft: FType): Column = ft match {
    case BytesT        => unbase64(c)
    case DateT         => date_add(to_date(lit("1970-01-01")), c)
    case DateTimeT     => timestamp_micros(c)
    case SubRecordT(s) => // struct(...) is never null — preserve record-level null
      when(c.isNotNull, struct(s.fields.map(f => decodeField(c(f.name), f).as(f.name)): _*))
    case lt: ListT     => lt.elem match {
      case BytesT | DateT | DateTimeT | _: SubRecordT =>
        transform(c, e => decodeValue(e, lt.elem))
      case _ => c
    }
    case mt: MapT      => mt.value match {
      case BytesT | DateT | DateTimeT | _: SubRecordT =>
        map_from_arrays(map_keys(c), transform(map_values(c), e => decodeValue(e, mt.value)))
      case _ => c
    }
    case _             => c
  }

  private def decodeField(c: Column, f: FieldSpec): Column =
    if (f.required) decodeValue(c, f.ftype)
    else decodeValue(c(branchName(f.ftype)), f.ftype)

  /** avro_load: parse an Avro-JSON string column back to the record's
    * natural struct (unions unwrapped, logical types restored).
    */
  def avroLoads(jsonCol: Column, schema: RecordSchema): Column = {
    val parsed = from_json(jsonCol, wrappedStructType(schema))
    struct(schema.fields.map(f => decodeField(parsed(f.name), f).as(f.name)): _*)
  }
}

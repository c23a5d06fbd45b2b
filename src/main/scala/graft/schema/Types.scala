package graft.schema

import org.apache.spark.sql.types._

/** Field-type ADT mirroring the reference's type system
  * (pyschema/types.py :: Text, Bytes, Integer, Float, Boolean, Enum, Date,
  * DateTime, List, Map, SubRecord — see SURVEY.md §1.2; /root/reference was
  * empty at survey time, so citations are upstream-path based).
  *
  * Each type knows its Spark `DataType`; constraint semantics (enum
  * membership, integer width, element bounds) are carried on the type and
  * compiled to Catalyst `Column` predicates by
  * [[graft.compile.ConstraintCompiler]] — never UDFs.
  */
sealed trait FType {
  def dataType: DataType
}

/** Unicode string (pyschema Text). */
case object TextT extends FType { val dataType: DataType = StringType }

/** Byte string (pyschema Bytes); JSON path is base64. */
case object BytesT extends FType { val dataType: DataType = BinaryType }

/** Integer with byte-width `size` (pyschema Integer(size=)); width bounds
  * become range constraints when narrower than 8.
  */
final case class IntT(size: Int = 8) extends FType {
  require(Set(2, 4, 8).contains(size), s"unsupported int size $size")
  val dataType: DataType = size match {
    case 2 => ShortType
    case 4 => IntegerType
    case _ => LongType
  }
  def lo: Long = -(1L << (8 * size - 1))
  def hi: Long = (1L << (8 * size - 1)) - 1
}

/** Float with byte-width `size` (pyschema Float). */
final case class FloatT(size: Int = 8) extends FType {
  require(size == 4 || size == 8)
  val dataType: DataType = if (size == 4) FloatType else DoubleType
}

case object BoolT extends FType { val dataType: DataType = BooleanType }

/** Enum over a closed string set (pyschema Enum) — membership is a
  * constraint compiled to `col.isin(values)`.
  */
final case class EnumT(values: Seq[String]) extends FType {
  val dataType: DataType = StringType
}

case object DateT extends FType { val dataType: DataType = DateType }
case object DateTimeT extends FType { val dataType: DataType = TimestampType }

/** Homogeneous list (pyschema List(elem)); optional element bounds for
  * integer elements (the `tokens: array<int32>` vocabulary constraint).
  */
final case class ListT(
    elem: FType,
    containsNull: Boolean = false,
    elemMin: Option[Long] = None,
    elemMax: Option[Long] = None
) extends FType {
  val dataType: DataType = ArrayType(elem.dataType, containsNull)
}

/** String-keyed map (pyschema Map(valueField)); optional numeric bounds on
  * the values (R12 map-value validation path).
  */
final case class MapT(
    value: FType,
    valueMin: Option[Long] = None,
    valueMax: Option[Long] = None
) extends FType {
  val dataType: DataType = MapType(StringType, value.dataType, valueContainsNull = true)
}

/** Nested record (pyschema SubRecord). */
final case class SubRecordT(schema: RecordSchema) extends FType {
  def dataType: DataType = schema.structType
}

/** One declared field: name + type + nullability + default + extra
  * per-field validation knobs (regex for strings, numeric range).
  * Mirrors pyschema/core.py :: Field (declaration-ordered; see SURVEY §1.1).
  */
final case class FieldSpec(
    name: String,
    ftype: FType,
    required: Boolean = false,
    default: Option[Any] = None,
    description: String = "",
    regex: Option[String] = None,
    min: Option[Long] = None,
    max: Option[Long] = None,
    maxBytes: Option[Int] = None // for BytesT: octet-length upper bound
) {
  def structField: StructField =
    StructField(name, ftype.dataType, nullable = !required || default.isDefined,
      metadata = if (description.isEmpty) Metadata.empty
      else new MetadataBuilder().putString("description", description).build())
}

package graft.json

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.{RecordSchema, SchemaRegistry}

/** JSON round-trip with record-name dispatch — the engine analogue of the
  * reference's serialization surface (pyschema/core.py :: dumps/loads with
  * the `$record_name` discriminator; SURVEY §2.1 R7–R10).
  *
  * Differences forced by the distributed setting: the reference throws
  * `ParseError` per record; an engine over 10^12 rows must never throw
  * per-row, so unknown/malformed records become violation rows
  * (`schema_dispatch`) instead (SURVEY §2.1 R10).
  */
object JsonCodec {

  val Discriminator = "$record_name"

  /** dumps: one JSON string column carrying the discriminator + all fields.
    * Field order = declaration order (R2), discriminator first.
    */
  def dumps(df: DataFrame, schema: RecordSchema): Column = {
    val cols = lit(schema.name).as(Discriminator) +:
      schema.fieldNames.map(n => col(n).as(n))
    to_json(struct(cols: _*))
  }

  /** loads: parse a JSON column against ONE registered schema, keeping only
    * rows whose discriminator matches. Returns the parsed struct column.
    */
  def loadsAs(jsonCol: Column, schema: RecordSchema): Column =
    from_json(jsonCol, schema.structType)

  def recordName(jsonCol: Column): Column =
    get_json_object(jsonCol, s"$$['$Discriminator']")

  /** Registry dispatch (R3, R10): split a mixed JSON frame by discriminator.
    * Returns (parsed-per-schema map, unknown-record violations frame).
    * Each registered name gets `from_json` with ITS schema — a filter +
    * projection per name over one scan; unregistered names surface as
    * (json, constraint_id='schema_dispatch').
    */
  def dispatch(df: DataFrame, jsonColName: String,
               names: Seq[String]): (Map[String, DataFrame], DataFrame) = {
    val named = df.withColumn("_rn", recordName(col(jsonColName)))
    val parsed = names.flatMap { n =>
      SchemaRegistry.lookup(n).map { s =>
        n -> named.filter(col("_rn") === n)
          .withColumn("_rec", loadsAs(col(jsonColName), s))
          .select(col("_rec.*"))
      }
    }.toMap
    val unknown = named.filter(col("_rn").isNull || !col("_rn").isin(names: _*))
      .select(col(jsonColName).as("payload"), lit("schema_dispatch").as("constraint_id"))
    (parsed, unknown)
  }
}

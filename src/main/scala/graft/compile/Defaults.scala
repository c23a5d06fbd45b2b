package graft.compile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.schema.RecordSchema

/** Default-value application (pyschema Record.__init__ missing-kwarg →
  * default semantics, SURVEY §2.1 R5): on the load path, NULL in a field
  * with a declared default becomes the default. Pure coalesce projections —
  * runs before the constraint pass so `Required` accepts defaulted fields,
  * exactly like the reference (a missing field with a default never
  * raises).
  */
object Defaults {

  def apply(df: DataFrame, schema: RecordSchema): DataFrame =
    schema.fields.foldLeft(df) { (acc, f) =>
      f.default match {
        case Some(d) =>
          acc.withColumn(f.name,
            coalesce(col(f.name), lit(d).cast(f.ftype.dataType)))
        case None => acc
      }
    }
}

package graft

import org.apache.spark.sql.functions._
import graft.compile.ConstraintCompiler
import graft.schema._

/** Nested SubRecord validation: dotted-path ids, parent-null guard. */
class SubRecordSpec extends SparkTestBase {

  import spark.implicits._

  private val inner = RecordSchema("Inner", Seq(
    FieldSpec("city", TextT, required = true),
    FieldSpec("zip", IntT(4), min = Some(1L), max = Some(99999L))),
    autoRegister = false)

  private val outer = RecordSchema("Outer", Seq(
    FieldSpec("id", IntT(8), required = true),
    FieldSpec("addr", SubRecordT(inner))),
    autoRegister = false)

  private def viol(id: java.lang.Long, city: String, zip: java.lang.Integer,
                   addrNull: Boolean): Set[String] = {
    val df =
      if (addrNull)
        Seq(Tuple1(Option(id).map(_.toLong))).toDF("id")
          .withColumn("addr",
            lit(null).cast("struct<city:string,zip:int>"))
      else
        Seq((Option(id).map(_.toLong), city, Option(zip).map(_.toInt)))
          .toDF("id", "city", "zip")
          .select(col("id"), struct(col("city"), col("zip").cast("int").as("zip")).as("addr"))
    ConstraintCompiler.violations(df, outer.rowConstraints, Seq("id"))
      .select("constraint_id").as[String].collect().toSet
  }

  test("nested ids carry the dotted path") {
    assert(outer.rowConstraints.map(_.id).toSet ===
      Set("required_id", "int_width_id" ,"required_addr.city", "int_width_addr.zip", "range_addr.zip")
        .filterNot(_ == "int_width_id")) // id is IntT(8): no width constraint
  }

  test("valid nested record passes") {
    assert(viol(1L, "paris", 750, addrNull = false) === Set.empty)
  }

  test("nested violations propagate with dotted ids") {
    assert(viol(1L, null, 750, addrNull = false) === Set("required_addr.city"))
    assert(viol(1L, "paris", 0, addrNull = false) === Set("range_addr.zip"))
  }

  test("NULL sub-record fires nothing nested (one violation per cause)") {
    assert(viol(1L, null, null, addrNull = true) === Set.empty)
  }
}

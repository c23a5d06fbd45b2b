package graft

import org.apache.spark.sql.functions._
import graft.compile.{ConstraintCompiler, Defaults}
import graft.constraint._
import graft.schema._

/** R5 (defaults) + R12 load-path type conformance + R23 custom validators. */
class DefaultsTypeSpec extends SparkTestBase {

  import spark.implicits._

  test("defaults fill NULLs before validation, so Required passes (R5)") {
    val schema = RecordSchema("Dft", Seq(
      FieldSpec("k", TextT, required = true),
      FieldSpec("n", IntT(8), required = true, default = Some(42L))),
      autoRegister = false)
    val df = Seq(("a", Some(1L)), ("b", None)).toDF("k", "n")
    val filled = Defaults(df, schema)
    assert(filled.filter(col("n").isNull).count() === 0L)
    assert(filled.filter(col("k") === "b").head().getLong(1) === 42L)
    val v = ConstraintCompiler.violations(filled, schema.rowConstraints, Seq("k"))
    assert(v.count() === 0L)
  }

  test("TypeConform: strings that fail to parse are violations, parseable pass (R12)") {
    val cs = Seq(
      TypeConform("d", "date"),
      TypeConform("x", "int"))
    val df = Seq(
      ("2026-08-16", "12"),
      ("16/08/2026", "12"),
      ("2026-08-16", "twelve"),
      (null, null)).toDF("d", "x")
    val got = ConstraintCompiler
      .violations(df.withColumn("k", monotonically_increasing_id()), cs, Seq("k", "d", "x"))
      .select("constraint_id").as[String].collect().sorted.toSeq
    assert(got === Seq("type_conform_d", "type_conform_x"))
  }

  test("custom validators: pure-Column rule and a UDF escape hatch (R23)") {
    val palindrome = org.apache.spark.sql.functions.udf(
      (s: String) => s != null && s == s.reverse)
    val cs = Seq(
      CustomRow("even_len", length(col("s")) % 2 =!= 0),
      CustomRow("not_palindrome_udf", !palindrome(col("s"))))
    val df = Seq("abba", "abc", "ab").toDF("s")
    val got = ConstraintCompiler.violations(df, cs, Seq("s"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(
      ("abc", "even_len"),
      ("abc", "not_palindrome_udf"),
      ("ab", "not_palindrome_udf")))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.compile.ConstraintCompiler
import graft.constraint._
import graft.schema._

/** Accept/reject corpus (FIXTURES.md §3) — the reconstructed reference
  * unit-test semantics, table-driven over the compiled Column predicates.
  */
class CompilerSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = RecordSchema("T", Seq(
    FieldSpec("s", TextT, required = true, regex = Some("^ok-[0-9]+$")),
    FieldSpec("e", EnumT(Seq("web", "pdf", "book"))),
    FieldSpec("n", IntT(4), min = Some(1L), max = Some(100L)),
    FieldSpec("xs", ListT(IntT(4), elemMin = Some(0L), elemMax = Some(9L)))),
    autoRegister = false)

  private def violationsFor(s: String, e: String, n: Integer, xs: Seq[Integer]): Set[String] = {
    val df = Seq((Option(s), Option(e), Option(n).map(_.toInt), Option(xs)))
      .toDF("s", "e", "n", "xs")
      .select(col("s"), col("e"), col("n").cast("int").as("n"), col("xs").cast("array<int>").as("xs"))
    ConstraintCompiler.violations(df.withColumn("k", lit(1)), schema.rowConstraints, Seq("k"))
      .select("constraint_id").collect().map(_.getString(0)).toSet
  }

  test("valid row produces zero violations") {
    assert(violationsFor("ok-1", "web", 5, Seq(0, 9)) === Set.empty)
  }
  test("null required field → required_*, nothing else fires on null") {
    assert(violationsFor(null, null, null, null) === Set("required_s"))
  }
  test("regex violation") {
    assert(violationsFor("bad", "web", 5, Seq(1)) === Set("regex_s"))
  }
  test("enum violation (case-sensitive, like the reference)") {
    assert(violationsFor("ok-1", "WEB", 5, Seq(1)) === Set("enum_e"))
    assert(violationsFor("ok-1", "__unknown__", 5, Seq(1)) === Set("enum_e"))
  }
  test("range violations at both edges, boundaries accepted") {
    assert(violationsFor("ok-1", "web", 0, Seq(1)) === Set("range_n"))
    assert(violationsFor("ok-1", "web", 101, Seq(1)) === Set("range_n"))
    assert(violationsFor("ok-1", "web", 1, Seq(1)) === Set.empty)
    assert(violationsFor("ok-1", "web", 100, Seq(1)) === Set.empty)
  }
  test("array element violations: out of range and null element") {
    assert(violationsFor("ok-1", "web", 5, Seq(-1)) === Set("array_elem_xs"))
    assert(violationsFor("ok-1", "web", 5, Seq(10)) === Set("array_elem_xs"))
    assert(violationsFor("ok-1", "web", 5, Seq(1, null, 2)) === Set("array_elem_xs"))
    assert(violationsFor("ok-1", "web", 5, Seq.empty[Integer]) === Set.empty)
  }
  test("single mutation → exactly the matching constraint id (property over corpus)") {
    val cases = Seq(
      ("bad", "web", 5, Seq[Integer](1)) -> "regex_s",
      ("ok-1", "nope", 5, Seq[Integer](1)) -> "enum_e",
      ("ok-1", "web", -5, Seq[Integer](1)) -> "range_n",
      ("ok-1", "web", 5, Seq[Integer](99)) -> "array_elem_xs")
    cases.foreach { case ((s, e, n, xs), expected) =>
      assert(violationsFor(s, e, n, xs) === Set(expected), s"case $expected")
    }
  }
  test("violation count column agrees with violation fan-out") {
    val df = Seq(
      ("ok-1", "web", 5, Seq(1)),
      ("bad", "nope", 0, Seq(-1))).toDF("s", "e", "n", "xs")
      .select(col("s"), col("e"), col("n").cast("int"), col("xs").cast("array<int>"))
    val counted = ConstraintCompiler.withCounts(df, schema.rowConstraints)
      .agg(sum(col(ConstraintCompiler.VCountCol))).head().getLong(0)
    val exploded = ConstraintCompiler.violations(
      df.withColumn("k", monotonically_increasing_id()), schema.rowConstraints, Seq("k")).count()
    assert(counted === exploded)
    assert(counted === 4L)
  }

  test("CondRequire truth table: guard/consequent NULL semantics") {
    // (guard-col, consequent-col) over nullable booleans encoded as ints:
    // violation ⇔ COALESCE(g,false) && !COALESCE(c,false)
    val rows = Seq[(Long, Option[Int], Option[Int])](
      (1L, Some(1), Some(1)), // guard fires, consequent holds → pass
      (2L, Some(1), Some(0)), // guard fires, consequent fails → VIOLATION
      (3L, Some(1), None), // guard fires, consequent unproven (NULL) → VIOLATION
      (4L, Some(0), Some(0)), // guard doesn't fire → pass
      (5L, None, Some(0)), // guard unproven (NULL) → pass
      (6L, None, None) // both unproven → pass
    )
    val df = rows.toDF("k", "g", "c")
    val rule = CondRequire("cond_rule",
      col("g") === 1, col("c") === 1)
    val got = ConstraintCompiler.violations(df, Seq(rule), Seq("k"))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 3L))
  }
}

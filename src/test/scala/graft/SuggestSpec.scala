package graft

import org.apache.spark.sql.functions._
import graft.compile.ConstraintCompiler
import graft.constraint._
import graft.gen.SyntheticTokens
import graft.stats.ConstraintSuggestion
import graft.stats.ConstraintSuggestion.Spec
import graft.unique.SaltedUniqueness

/** Constraint suggestion: profile → propose → compile → validate. */
class SuggestSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val tokenSpec = Spec(
    numericCols = Seq("n_tok"),
    stringCols = Seq("doc_id", "source"),
    arrayIntCols = Seq("tokens"),
    keyCols = Seq("doc_id"),
    enumCandidates = Seq("source"))

  test("clean slice passes its own suggested constraint suite (round trip)") {
    val clean = SyntheticTokens.cleanFrom(spark, dir)
    val sugg = ConstraintSuggestion.suggest(clean, tokenSpec)
      .as[(String, String, String)].collect().toSeq
    // the clean generator has no nulls, no dups, bounded values
    assert(sugg.contains(("doc_id", "required", "")))
    assert(sugg.contains(("doc_id", "unique", "")))
    val cs = ConstraintSuggestion.toConstraints(sugg)
    val rowCs = cs.collect { case r: RowConstraint => r }
    assert(rowCs.nonEmpty)
    val violations = ConstraintCompiler.withPass(clean, rowCs)
      .filter(!col("_pass")).count()
    assert(violations == 0L, "suggested bounds are the observed bounds")
    assert(cs.exists(_.isInstanceOf[Unique]))
    assert(SaltedUniqueness.duplicates(clean, "doc_id").isEmpty)
  }

  test("planted violations shape the proposal on the dirty slice") {
    val sugg = ConstraintSuggestion.suggest(SyntheticTokens.dirtyFrom(spark, dir), tokenSpec)
      .as[(String, String, String)].collect().toSeq
    // doc_id carries NULLs and duplicate keys → earns nothing
    assert(!sugg.exists(_._1 == "doc_id"))
    // planted n_tok extremes widen the observed range
    assert(sugg.contains(("n_tok", "range", "[0,9999]")))
    // the unknown-source plant joins the proposed enum
    val enumParam = sugg.collectFirst { case ("source", "enum", p) => p }.get
    assert(enumParam.split(ConstraintSuggestion.EnumSep).contains("__unknown__"))
    assert(sugg.contains(("tokens", "required", "")))
    // the planted -1 element sets the observed element floor
    assert(sugg.collectFirst { case ("tokens", "elem_range", p) => p }
      .exists(_.startsWith("[-1,")))
  }

  test("high-cardinality enum candidate is dropped by the maxEnumCard guard") {
    val df = spark.range(0, 100)
      .select(concat(lit("v"), col("id")).as("s"))
    val sugg = ConstraintSuggestion.suggest(df,
        Spec(stringCols = Seq("s"), enumCandidates = Seq("s"), maxEnumCard = 32))
      .as[(String, String, String)].collect().toSeq
    assert(sugg.contains(("s", "required", "")))
    assert(!sugg.exists(_._2 == "enum"))
  }

  test("toConstraints maps every suggested kind it claims to support") {
    val cs = ConstraintSuggestion.toConstraints(Seq(
      ("a", "required", ""), ("a", "range", "[-5,10]"),
      ("b", "enum", Seq("x", "y").mkString(ConstraintSuggestion.EnumSep)), ("c", "elem_range", "[0,9]"),
      ("k", "unique", ""), ("c", "size_range", "[1,4]")))
    assert(cs.contains(Required("a")))
    assert(cs.contains(RangeBound("a", -5L, 10L)))
    assert(cs.contains(EnumIn("b", Seq("x", "y"))))
    assert(cs.contains(ArrayElemRange("c", 0L, 9L)))
    assert(cs.contains(Unique("k")))
    assert(!cs.exists(_.id.contains("size_range")), "size_range is advisory-only")
  }

  test("double column round trip: floor/ceil bounds, not toward-zero truncation") {
    // observed min -3.7 / max 5.7 must suggest [-4,6], NOT [-3,5] — a bare
    // long cast truncates toward zero and the table would fail its own
    // suggested RangeBound (ADVICE r3, medium)
    val df = Seq(-3.7, 0.0, 5.7).toDF("x")
    val sugg = ConstraintSuggestion.suggest(df, Spec(numericCols = Seq("x")))
      .as[(String, String, String)].collect().toSeq
    assert(sugg.contains(("x", "range", "[-4,6]")))
    val rowCs = ConstraintSuggestion.toConstraints(sugg)
      .collect { case r: RowConstraint => r }
    assert(ConstraintCompiler.withPass(df, rowCs).filter(!col("_pass")).isEmpty,
      "profiled table passes its own suggested suite")
  }

  test("enum values containing commas survive the round trip intact") {
    val df = Seq("a,b", "c", "a,b", "c").toDF("s")
    val sugg = ConstraintSuggestion.suggest(df,
        Spec(stringCols = Seq("s"), enumCandidates = Seq("s")))
      .as[(String, String, String)].collect().toSeq
    val cs = ConstraintSuggestion.toConstraints(sugg)
    assert(cs.contains(EnumIn("s", Seq("a,b", "c"))),
      "a comma inside a value must not split it into bogus symbols")
    val rowCs = cs.collect { case r: RowConstraint => r }
    assert(ConstraintCompiler.withPass(df, rowCs).filter(!col("_pass")).isEmpty)
  }
}

package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.constraint._

/** Constraint suggestion: profile a table once and propose the constraint
  * set the data currently satisfies (the Deequ-style "suggestion" loop a
  * validation engine needs to bootstrap a schema for an unlabeled corpus;
  * beyond the pyschema reference, which only checks declared constraints).
  *
  * Output is one row per suggestion — (column, kind, param) — and
  * [[toConstraints]] maps those rows back into the engine's Constraint ADT
  * so the suggested suite is immediately executable by Validator /
  * ConstraintCompiler. By construction the profiled table passes its own
  * suggested row-constraint suite (observed min/max become the bounds) —
  * SuggestSpec asserts that round trip.
  *
  * Scale shape (10^12 rows): ONE scan. Every statistic — including the
  * per-column null counts, min/max, sizes and the enum value sets — lands
  * in a single `agg(...)` ⇒ one partial (map-side) + one final
  * HashAggregate; exact multi-column count_distinct adds Catalyst's Expand
  * (rows × #distinct-aggs before the partial agg — the documented price of
  * exactness; StatsPass.sketch carries the HLL alternative). The suggestion
  * assembly is a 1-row projection (array-of-struct → filter → explode) —
  * never a driver-side collect. `enumCandidates` is the caller's
  * cardinality assertion: `collect_set` is only built for those columns,
  * and a candidate that turns out high-cardinality is dropped by the
  * `maxEnumCard` guard at emission (the set itself was still gathered —
  * do not list columns that could hold millions of distinct values).
  */
object ConstraintSuggestion {

  /** Enum-param value separator: ASCII unit separator (0x1F), not ',' — an
    * enum value containing a comma would be silently split into bogus
    * symbols on the [[toConstraints]] round trip, yielding an EnumIn that
    * rejects valid rows (ADVICE r3). Mirrored by the oracle's
    * array_to_string(vals, chr(31)). Values containing 0x1F itself are
    * control-character garbage a text schema would reject upstream.
    */
  val EnumSep = "\u001F"

  /** Columns to profile; all lists may be empty. `keyCols` get a
    * uniqueness check, `enumCandidates` (⊆ stringCols) get a closed-set
    * proposal when distinct ≤ maxEnumCard.
    */
  final case class Spec(
      numericCols: Seq[String] = Nil,
      stringCols: Seq[String] = Nil,
      arrayIntCols: Seq[String] = Nil,
      keyCols: Seq[String] = Nil,
      enumCandidates: Seq[String] = Nil,
      maxEnumCard: Int = 32)

  def suggest(df: DataFrame, spec: Spec): DataFrame = {
    def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls")
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("__rows")) ++
        // floor/ceil BEFORE the long cast: a bare cast truncates toward
        // zero, so a double column with observed min -3.7 would suggest
        // lo=-3 and the profiled table would FAIL its own suggested suite
        // (ADVICE r3, medium). Integral columns are unaffected.
        spec.numericCols.flatMap(c => Seq(
          nulls(c),
          floor(min(col(c))).cast("long").as(s"${c}__min"),
          ceil(max(col(c))).cast("long").as(s"${c}__max"))) ++
        spec.stringCols.flatMap(c => Seq(nulls(c)) ++
          (if (spec.enumCandidates.contains(c) || spec.keyCols.contains(c))
             Seq(count_distinct(col(c)).as(s"${c}__distinct"))
           else Nil) ++
          (if (spec.enumCandidates.contains(c))
             Seq(sort_array(collect_set(col(c))).as(s"${c}__vals"))
           else Nil)) ++
        spec.arrayIntCols.flatMap(c => Seq(
          nulls(c),
          min(array_min(col(c))).cast("long").as(s"${c}__emin"),
          max(array_max(col(c))).cast("long").as(s"${c}__emax"),
          min(size(col(c))).as(s"${c}__smin"),
          max(size(col(c))).as(s"${c}__smax")))
    val prof = df.agg(aggs.head, aggs.tail: _*)

    def n(c: String) = col(s"${c}__nulls")
    def requiredRow(c: String): Column =
      when(n(c) === 0 && col("__rows") > 0,
        struct(lit(c).as("column"), lit("required").as("kind"), lit("").as("param")))
    def rangeParam(lo: Column, hi: Column): Column =
      concat(lit("["), lo.cast("string"), lit(","), hi.cast("string"), lit("]"))
    val entries: Seq[Column] =
      spec.numericCols.flatMap(c => Seq(
        requiredRow(c),
        when(col(s"${c}__min").isNotNull,
          struct(lit(c).as("column"), lit("range").as("kind"),
            rangeParam(col(s"${c}__min"), col(s"${c}__max")).as("param"))))) ++
      spec.stringCols.flatMap(c => Seq(requiredRow(c)) ++
        (if (spec.keyCols.contains(c))
          Seq(when(n(c) === 0 && col(s"${c}__distinct") === col("__rows"),
            struct(lit(c).as("column"), lit("unique").as("kind"), lit("").as("param"))))
         else Nil) ++
        (if (spec.enumCandidates.contains(c))
          Seq(when(col(s"${c}__distinct").between(1, spec.maxEnumCard),
            struct(lit(c).as("column"), lit("enum").as("kind"),
              concat_ws(EnumSep, col(s"${c}__vals")).as("param"))))
         else Nil)) ++
      spec.arrayIntCols.flatMap(c => Seq(
        requiredRow(c),
        when(col(s"${c}__emin").isNotNull,
          struct(lit(c).as("column"), lit("elem_range").as("kind"),
            rangeParam(col(s"${c}__emin"), col(s"${c}__emax")).as("param"))),
        when(col(s"${c}__smin").isNotNull,
          struct(lit(c).as("column"), lit("size_range").as("kind"),
            rangeParam(col(s"${c}__smin"), col(s"${c}__smax")).as("param")))))

    prof
      .select(explode(filter(array(entries: _*), e => e.isNotNull)).as("s"))
      .select(col("s.column").as("column"), col("s.kind").as("kind"),
        col("s.param").as("param"))
      .orderBy(col("column"), col("kind"))
  }

  /** Suggested rows → executable Constraint ADT. `unique` maps to the
    * table-level Unique (executed by SaltedUniqueness via Validator);
    * `size_range` is advisory-only (no standalone row constraint bounds an
    * array's size without a claimed-count column) and is skipped here.
    */
  def toConstraints(rows: Seq[(String, String, String)]): Seq[Constraint] = {
    val Range = raw"\[(-?\d+),(-?\d+)\]".r
    rows.flatMap {
      case (c, "required", _) => Some(Required(c))
      case (c, "unique", _) => Some(Unique(c))
      case (c, "enum", vs) => Some(EnumIn(c, vs.split(EnumSep).toSeq))
      case (c, "range", Range(lo, hi)) => Some(RangeBound(c, lo.toLong, hi.toLong))
      case (c, "elem_range", Range(lo, hi)) =>
        Some(ArrayElemRange(c, lo.toLong, hi.toLong))
      case _ => None
    }
  }
}

package graft.constraint

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Constraint ADT — the engine's logical validation language.
  *
  * Row constraints compile to a single pure Catalyst `Column` predicate
  * (`violates`): true ⇔ the row violates the constraint. Null handling
  * follows the reference's accept/reject semantics (pyschema field.dump:
  * None is accepted unless the consumer requires the field — SURVEY §1.1
  * R15): every non-Required constraint passes on NULL input, so each
  * constraint fires independently and a null row yields exactly the
  * `required_*` violation.
  *
  * Table constraints (Unique, RefIntegrity, Drift) need cross-row context
  * and are executed by dedicated passes (graft.unique / graft.ref /
  * graft.drift), not per-row predicates.
  */
sealed trait Constraint { def id: String }

sealed trait RowConstraint extends Constraint {
  /** true ⇔ row VIOLATES the constraint (never null). */
  def violates: Column
}

/** Field must be non-null (pyschema required semantics, SURVEY §2.1 R15). */
final case class Required(column: String) extends RowConstraint {
  val id = s"required_$column"
  def violates: Column = col(column).isNull
}

/** String must match anchored regex when present. */
final case class RegexMatch(column: String, pattern: String) extends RowConstraint {
  val id = s"regex_$column"
  def violates: Column = col(column).isNotNull && !col(column).rlike(pattern)
}

/** Closed-set membership (pyschema Enum — SURVEY §2.1 R13). */
final case class EnumIn(column: String, values: Seq[String]) extends RowConstraint {
  val id = s"enum_$column"
  def violates: Column = col(column).isNotNull && !col(column).isin(values: _*)
}

/** Inclusive numeric range (user range constraint). */
final case class RangeBound(column: String, lo: Long, hi: Long) extends RowConstraint {
  val id = s"range_$column"
  def violates: Column = col(column).isNotNull && !col(column).between(lo, hi)
}

/** Integer byte-width bound (pyschema Integer(size=) — R14); distinct id
  * from RangeBound so width and user-range checks can coexist on a field.
  */
final case class IntWidth(column: String, lo: Long, hi: Long) extends RowConstraint {
  val id = s"int_width_$column"
  def violates: Column = col(column).isNotNull && !col(column).between(lo, hi)
}

/** Every array element within [lo, hi] and (optionally) non-null
  * (pyschema List element validation — R12). The `tokens` vocabulary
  * bound of BASELINE.json:15.
  *
  * `int32Elem` opts into the codegen'd [[graft.functions.ArrayIntBounds]]
  * fast path — ONLY valid for array<int> columns (the expression reads a
  * 4-byte stride; other widths would read garbage — ADVICE r1). The schema
  * compiler sets it from the declared element type; the expression itself
  * also rejects non-int input at analysis time as a second line of defense.
  */
final case class ArrayElemRange(
    column: String, lo: Long, hi: Long, allowNullElems: Boolean = false,
    int32Elem: Boolean = false
) extends RowConstraint {
  val id = s"array_elem_$column"
  def violates: Column = {
    if (!allowNullElems && int32Elem) {
      // hot path (tokens at 10^12 rows): codegen'd primitive loop —
      // semantics identical to exists(t -> t IS NULL OR t∉[lo,hi])
      col(column).isNotNull &&
        graft.functions.exprs.array_int_bounds_violated(col(column), lo, hi)
    } else if (allowNullElems) {
      // null elements permitted: only out-of-range non-null values violate
      col(column).isNotNull &&
        exists(col(column), t => t.isNotNull && !t.between(lo, hi))
    } else {
      // general width path: null elements or out-of-range values violate
      col(column).isNotNull &&
        exists(col(column), t => t.isNull || !t.between(lo, hi))
    }
  }
}

/** Claimed count column equals actual array size — the n_tok == size(tokens)
  * consistency invariant (BASELINE.json:6).
  */
final case class ArraySizeEquals(arrayCol: String, countCol: String) extends RowConstraint {
  val id = "size_consistent"
  def violates: Column =
    col(arrayCol).isNotNull && col(countCol).isNotNull &&
      size(col(arrayCol)) =!= col(countCol)
}

/** Lenient-load type conformance (pyschema per-type load validation, R12):
  * a string column must parse as `targetType` (e.g. "date", "timestamp",
  * "int", "double") when present. try_cast keeps the predicate pure and
  * non-throwing under ANSI mode — the reference raises ValueError per
  * record; the engine records a violation instead (SURVEY §3.1 E2).
  */
final case class TypeConform(column: String, targetType: String) extends RowConstraint {
  val id = s"type_conform_$column"
  def violates: Column =
    col(column).isNotNull && expr(s"try_cast($column AS $targetType)").isNull
}

/** Every map VALUE within [lo, hi] when present (pyschema Map(valueField)
  * value validation — R12). NULL map values pass (their null-ness is a
  * separate concern); the map itself may be NULL.
  */
final case class MapValueRange(column: String, lo: Long, hi: Long) extends RowConstraint {
  val id = s"map_range_$column"
  def violates: Column =
    col(column).isNotNull &&
      exists(map_values(col(column)), v => v.isNotNull && !v.between(lo, hi))
}

/** Binary payload byte-length bound (pyschema Bytes — R12 bytes path). */
final case class BytesMaxLen(column: String, maxBytes: Int) extends RowConstraint {
  val id = s"bytes_len_$column"
  def violates: Column =
    col(column).isNotNull && octet_length(col(column)) > maxBytes
}

/** Float sanity (pyschema Float + no-NaN option). */
final case class NotNaN(column: String) extends RowConstraint {
  val id = s"not_nan_$column"
  def violates: Column = col(column).isNotNull && isnan(col(column))
}

/** Escape hatch: user-registered named validator. Predicate must be a pure
  * Column expression (optimization-barrier-free); `violatesWhen` receives
  * nothing and closes over functions.col — mirrors pyschema custom Field
  * subclasses (R23) without giving up codegen.
  */
final case class CustomRow(id: String, violatesWhen: Column) extends RowConstraint {
  def violates: Column = coalesce(violatesWhen, lit(false))
}

/** Cross-field conditional rule: when `guard` holds, `consequent` must
  * hold too ("rows WHERE <guard> must satisfy <consequent>" — the
  * conditional form pyschema users write as custom Field validators,
  * declared instead of coded). Pure Column in, pure Column out, so it
  * rides the same fused row pass and stays inside whole-stage codegen.
  *
  * NULL semantics: a NULL guard verdict never fires the rule (the
  * condition is unproven, so nothing is demanded — mirrors how every
  * non-Required constraint passes on NULL input); under a FIRING guard a
  * NULL consequent verdict IS a violation (the demanded property is
  * unproven — mirrors Required's strictness on the demanded side).
  */
final case class CondRequire(id: String, guard: Column, consequent: Column)
    extends RowConstraint {
  def violates: Column =
    coalesce(guard, lit(false)) && !coalesce(consequent, lit(false))
}

/** Guards a nested (SubRecord) constraint so it only fires when the parent
  * struct is present — keeps "one violation per cause" under null parents.
  */
final case class NestedGuard(parentPath: String, inner: RowConstraint) extends RowConstraint {
  def id: String = inner.id
  def violates: Column = col(parentPath).isNotNull && inner.violates
}

// ----- table-level constraints (cross-row passes) -----

/** Key uniqueness — executed by graft.unique.SaltedUniqueness. */
final case class Unique(column: String) extends Constraint {
  val id = s"unique_$column"
}

/** Foreign-key containment in a dimension table — executed by
  * graft.ref.ReferentialCheck as a broadcast semi/anti join.
  */
final case class RefIntegrity(column: String, dimTable: String, dimColumn: String)
    extends Constraint {
  val id = s"ref_integrity_$column"
}

/** Distribution drift between epochs — executed by graft.drift.DriftGate
  * (two-sample KS + chi-square over per-epoch histograms); a KS statistic
  * above `ksThreshold` emits a table-level violation row.
  */
final case class Drift(column: String, epochColumn: String, bucketWidth: Long,
                       ksThreshold: Double = 0.1)
    extends Constraint {
  val id = s"drift_$column"
}

/** Intra-key ordering invariant: `column` must be non-decreasing when each
  * `keyColumn` partition is traversed in `orderColumn` order (out-of-order
  * ingestion / late-arrival detection). Cross-row within a key — executed
  * by graft.rel.OrderAudit as ONE shuffle on the key + a per-partition
  * sort and a running lag compare.
  */
final case class Monotonic(column: String, orderColumn: String, keyColumn: String)
    extends Constraint {
  val id = s"monotonic_$column"
}

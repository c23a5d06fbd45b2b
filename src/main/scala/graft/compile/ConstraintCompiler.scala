package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.constraint.RowConstraint
import graft.schema.RecordSchema

/** Compiles the row-constraint set into pure codegen-friendly projections
  * (SURVEY §2.3 T2–T4).
  *
  * Design rules learned from profiling at 10^6–10^7 rows:
  *  - NO lambda higher-order functions in the hot path (array_compact /
  *    filter(array) desugar to interpreted per-element lambdas, which both
  *    run slowly AND break whole-stage codegen for the operator — with
  *    codegen broken, common-subexpression elimination is lost and every
  *    constraint re-evaluates shared inputs).
  *  - Per-row violation COUNT is a plain integer sum of predicates
  *    (codegen'd, CSE applies).
  *  - Violation fan-out is explode(array(...)) + filter(isNotNull):
  *    Generate is codegen'd, and filtering AFTER the generator keeps the
  *    predicate from being pushed into (and duplicating) the per-row
  *    expressions.
  */
object ConstraintCompiler {

  val ViolationsCol = "_violations"
  val VCountCol = "_vcount"

  /** Per-row violated-constraint count — pure integer expression. */
  def violationCount(cs: Seq[RowConstraint]): Column = {
    require(cs.nonEmpty, "no row constraints to compile")
    cs.map(c => when(c.violates, 1).otherwise(0)).reduce(_ + _)
  }

  /** array<string> of violated constraint ids (null-free). Carries a lambda
    * filter — use only on small/emit paths, never in hot aggregates.
    */
  def violationIds(cs: Seq[RowConstraint]): Column =
    array_compact(array(cs.map(c => when(c.violates, lit(c.id))): _*))

  /** df + `_vcount` (int) — the hot row-validation pass (T3). */
  def withCounts(df: DataFrame, cs: Seq[RowConstraint]): DataFrame =
    df.withColumn(VCountCol, violationCount(cs))

  def withCounts(df: DataFrame, schema: RecordSchema): DataFrame =
    withCounts(df, schema.rowConstraints)

  /** df + `_violations` array column (id-bearing variant). */
  def withViolations(df: DataFrame, cs: Seq[RowConstraint]): DataFrame =
    df.withColumn(ViolationsCol, violationIds(cs))

  def withViolations(df: DataFrame, schema: RecordSchema): DataFrame =
    withViolations(df, schema.rowConstraints)

  /** Violation fan-out (T4): one output row per (key, violated constraint).
    * explode BEFORE the null filter keeps everything in codegen.
    */
  def violations(df: DataFrame, cs: Seq[RowConstraint], keyCols: Seq[String]): DataFrame = {
    require(cs.nonEmpty, "no row constraints to compile")
    df.select(keyCols.map(col) :+
        explode(array(cs.map(c => when(c.violates, lit(c.id))): _*)).as("constraint_id"): _*)
      .filter(col("constraint_id").isNotNull)
  }

  /** Per-row pass flag without fan-out (for summaries). */
  def withPass(df: DataFrame, cs: Seq[RowConstraint]): DataFrame =
    withCounts(df, cs).withColumn("_pass", col(VCountCol) === 0)
}

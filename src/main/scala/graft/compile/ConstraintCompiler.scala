package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.constraint.RowConstraint
import graft.schema.RecordSchema

/** Compiles the row-constraint set into ONE projection (SURVEY §2.3 T2–T4).
  *
  * Design: every constraint is a pure Column predicate, so the whole
  * validation pass is a single narrow `select` — zero shuffles, fully
  * inside WholeStageCodegen, and Parquet scan pruning/pushdown still apply
  * (the reference evaluates the same logic eagerly per record in Python;
  * we declare it and let Catalyst vectorize — SURVEY §3.2).
  *
  * Output per row: `_violations: array<string>` of violated constraint ids
  * (empty array ⇔ row passes the full suite).
  */
object ConstraintCompiler {

  val ViolationsCol = "_violations"

  /** array<string> of violated constraint ids for one row. */
  def violationIds(cs: Seq[RowConstraint]): Column = {
    require(cs.nonEmpty, "no row constraints to compile")
    // array_compact drops the NULLs left by non-firing constraints; keeps
    // the expression branch-free and codegen-friendly.
    array_compact(array(cs.map(c => when(c.violates, lit(c.id))): _*))
  }

  /** df + `_violations` column (row-validation pass, T3). */
  def withViolations(df: DataFrame, cs: Seq[RowConstraint]): DataFrame =
    df.withColumn(ViolationsCol, violationIds(cs))

  def withViolations(df: DataFrame, schema: RecordSchema): DataFrame =
    withViolations(df, schema.rowConstraints)

  /** Violation fan-out (T4): one output row per (key, violated constraint).
    * `keyCols` are carried through for the violation sink
    * (doc_id + constraint_id per BASELINE.json:6).
    */
  def violations(df: DataFrame, cs: Seq[RowConstraint], keyCols: Seq[String]): DataFrame =
    withViolations(df, cs)
      .select(keyCols.map(col) :+ explode(col(ViolationsCol)).as("constraint_id"): _*)

  /** Per-row pass flag without fan-out (for summaries). */
  def withPass(df: DataFrame, cs: Seq[RowConstraint]): DataFrame =
    withViolations(df, cs).withColumn("_pass", size(col(ViolationsCol)) === 0)
}

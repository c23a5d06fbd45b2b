package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity check via broadcast semi/anti join (SURVEY §2.3
  * T7; BASELINE.json:6 "referential checks on source via broadcast
  * semi-join against a dimension table").
  *
  * The dimension side is explicitly `broadcast(...)`-hinted: at 10^12 fact
  * rows the dim (source catalog) is tiny, and a broadcast join keeps the
  * check shuffle-free regardless of what table statistics Catalyst has.
  * NULL FKs are excluded (Required's job).
  */
object ReferentialCheck {

  /** Rows whose fk has NO match in dim (the violations). */
  def orphans(fact: DataFrame, fk: String, dim: DataFrame, dimKey: String): DataFrame =
    fact.filter(col(fk).isNotNull)
      .join(broadcast(dim.select(col(dimKey).as(fk)).distinct()), Seq(fk), "left_anti")

  /** Rows whose fk IS present (pass set). */
  def matched(fact: DataFrame, fk: String, dim: DataFrame, dimKey: String): DataFrame =
    fact.join(broadcast(dim.select(col(dimKey).as(fk)).distinct()), Seq(fk), "left_semi")

  def violations(fact: DataFrame, fk: String, dim: DataFrame, dimKey: String,
                 keyCols: Seq[String], constraintId: String): DataFrame =
    orphans(fact, fk, dim, dimKey)
      .select(keyCols.map(col) :+ lit(constraintId).as("constraint_id"): _*)
}

package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Referential-integrity check (SURVEY §2.3 T7; BASELINE.json:6
  * "referential checks on source via broadcast semi-join against a
  * dimension table").
  *
  * TWO physical strategies, chosen eagerly by dim cardinality (the same
  * measure-then-plan pattern as SaltedUniqueness.duplicatesHashCompacted):
  *
  *  - **Plan-literal InSet** (dim ≤ maxInSetKeys, atomic key type): the
  *    distinct pass-set is collected once at plan-build time and compiled
  *    into the row predicate as an `isin` (Catalyst converts to InSet's
  *    hash set above its threshold). The probe is then a task-local
  *    read-only set lookup inside whole-stage codegen — no broadcast, no
  *    join operator, no shared data structure. This matters measurably:
  *    a STRING-keyed BroadcastHashJoin probe against even a 20-entry
  *    HashedRelation ANTI-scales on this box (RowpassProbe, 2×10^8 rows:
  *    12.8 s @8 → 16.2 s @32 cores — the shared UnsafeHashedRelation is
  *    probed through one memory image by 32 threads, while the
  *    integer-key LongHashedRelation control runs 0.4 s flat), and it was
  *    the dominant non-scaling term of the round-5 headline suite. At
  *    10^12 rows the literal set is also strictly better: the check rides
  *    the scan with zero exchange on any plan.
  *  - **Broadcast anti/semi join** (big or non-atomic dim): the classic
  *    shuffle-free shape, unchanged.
  *
  * NULL FKs are excluded (Required's job); NULL dim keys are dropped from
  * the pass-set (a NULL never equi-matches, so the join path ignores them
  * identically).
  */
object ReferentialCheck {

  /** Dim cardinality gate for the InSet strategy. 10^4 literals ≈ a few
    * hundred KB of plan — far below broadcast-worthy sizes, far above any
    * real source/enum/partner catalog.
    */
  val MaxInSetKeys = 10000

  private def atomic(t: DataType): Boolean = t match {
    case StringType | BooleanType | DateType | TimestampType => true
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The dim's distinct non-null key set when small enough to ride the
    * plan as literals; None → caller must use the join strategy. EAGER:
    * runs a (dim-sized) Spark job at call time — the strategy choice
    * depends on the data, same contract as duplicatesHashCompacted.
    */
  private[graft] def smallDimSet(dim: DataFrame, dimKey: String,
                                 max: Int = MaxInSetKeys): Option[Seq[Any]] = {
    val field = dim.select(col(dimKey)).schema.head
    if (!atomic(field.dataType)) None
    else {
      val vals = dim.select(col(dimKey)).filter(col(dimKey).isNotNull)
        .distinct().limit(max + 1).collect().map(_.get(0)).toSeq
      if (vals.length > max) None else Some(vals)
    }
  }

  /** Rows whose fk has NO match in dim (the violations). */
  def orphans(fact: DataFrame, fk: String, dim: DataFrame, dimKey: String): DataFrame =
    smallDimSet(dim, dimKey) match {
      case Some(vals) if vals.isEmpty =>
        fact.filter(col(fk).isNotNull) // empty dim: every non-null fk orphans
      case Some(vals) =>
        fact.filter(col(fk).isNotNull && !col(fk).isin(vals: _*))
      case None =>
        fact.filter(col(fk).isNotNull)
          .join(broadcast(dim.select(col(dimKey).as(fk)).distinct()), Seq(fk), "left_anti")
    }

  /** Rows whose fk IS present (pass set). */
  def matched(fact: DataFrame, fk: String, dim: DataFrame, dimKey: String): DataFrame =
    smallDimSet(dim, dimKey) match {
      case Some(vals) if vals.isEmpty => fact.filter(lit(false))
      case Some(vals) => fact.filter(col(fk).isin(vals: _*))
      case None =>
        fact.join(broadcast(dim.select(col(dimKey).as(fk)).distinct()), Seq(fk), "left_semi")
    }

  def violations(fact: DataFrame, fk: String, dim: DataFrame, dimKey: String,
                 keyCols: Seq[String], constraintId: String): DataFrame =
    orphans(fact, fk, dim, dimKey)
      .select(keyCols.map(col) :+ lit(constraintId).as("constraint_id"): _*)
}

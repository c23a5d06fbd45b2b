package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency audit: which keys of a determinant column map to
  * MORE than one distinct dependent value — "same id, different payload",
  * the corruption mode uniqueness checks can't see (a duplicated key whose
  * copies AGREE is a dedup problem; copies that DISAGREE mean two writers
  * raced or an upstream join fanned out). pyschema users hand-code this as
  * a custom validator over grouped dumps; here it's one declarative
  * aggregate, and a discovery tool: run it on a candidate key before
  * declaring `Unique`/`required` constraints (complements
  * stats.ConstraintSuggestion, which profiles single columns).
  *
  * Scale shape: count(distinct dep) per key plans as a two-level
  * aggregate — partial distinct on (det, dep) compacts map-side, so the
  * exchange carries distinct pairs, not rows; a hot determinant key costs
  * its DISTINCT dependent cardinality (bounded for a real FD audit), not
  * its row count. NULL determinants group together (one audit row), same
  * as SQL GROUP BY.
  */
object FdAudit {

  /** One row per FD-violating determinant value, with the variant count
    * and the lexical extremes of the conflicting dependents (enough to
    * eyeball the conflict without shipping the full variant set).
    */
  def violations(df: DataFrame, det: String, dep: String): DataFrame =
    df.groupBy(col(det))
      .agg(countDistinct(col(dep)).as("n_variants"),
        min(col(dep)).as("dep_min"),
        max(col(dep)).as("dep_max"))
      .filter(col("n_variants") > 1)
}

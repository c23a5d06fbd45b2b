package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column data-quality audit — the pre-flight every similarity /
  * ANN / quantization operator in this package silently assumes: vectors
  * present, non-empty, one consistent dimension, all elements finite, and
  * a nonzero norm (cosine against a zero vector is undefined; one NaN
  * poisons every dot product it touches downstream).
  *
  * One corpus pass, one partial+final aggregate, nine exact integers out —
  * no floating accumulation anywhere (the per-row predicates are
  * element-wise tests; nothing is summed in FP), so the report is
  * bit-identical in any engine.
  *
  * Non-finite test: `isnan(x) OR abs(x) > 3.4028235e38` — the literal sits
  * strictly above Float.MaxValue (3.4028234663852886e38), so only ±Inf
  * exceeds it; the SAME formula runs in the DuckDB twin (which has isinf,
  * but mirroring the formula beats mirroring the intent). Zero-norm test:
  * no element differs from 0 — exact, no norm computation. NaN <> 0
  * evaluates true in both engines (both order NaN as a normal largest
  * value), but n_zero excludes non-finite rows anyway.
  *
  * The element-wise HOFs are interpreted lambdas over dim-sized arrays —
  * fine for an audit pass; if this ever sits in a hot loop at 10^12 rows,
  * the same fused-predicate custom-expression pattern as
  * [[graft.functions]]' ArrayIntBounds applies directly.
  */
object EmbAudit {

  /** One-row summary over the corpus; rows counted into exactly one of
    * n_null / n_empty / n_nullelem / n_nonfinite / n_zero / n_valid
    * (first failing class wins, in that order), plus the observed dim
    * range over non-empty vectors (dim_min = dim_max ⟺ consistent
    * dimension).
    *
    * n_nullelem exists because of three-valued logic (ADVICE r4): without
    * it, `exists(e, nonfinite-pred)` over a vector containing a NULL
    * element returns NULL, every class predicate collapses to false, and
    * the row lands in NO class — silently breaking the exactly-once
    * partition — while DuckDB's list_filter drops NULL elements and
    * classifies the row. `exists(e, isnull)` itself is never NULL (the
    * inner predicate is definite), so gating the later classes on
    * !hasNullElem makes their exists predicates definite too and the
    * partition provably exhaustive.
    */
  def summary(df: DataFrame, vecCol: String): DataFrame = {
    val e = col(vecCol)
    val present = e.isNotNull
    val dim = size(e)
    val hasNullElem = exists(e, x => x.isNull)
    val nonfinite = exists(e, x => isnan(x) || abs(x) > lit(3.4028235e38))
    val zero = !exists(e, x => x =!= lit(0.0f))
    df.agg(
      count(lit(1)).as("n_total"),
      sum(when(!present, 1L).otherwise(0L)).as("n_null"),
      sum(when(present && dim === 0, 1L).otherwise(0L)).as("n_empty"),
      min(when(present && dim > 0, dim)).cast("long").as("dim_min"),
      max(when(present && dim > 0, dim)).cast("long").as("dim_max"),
      sum(when(present && dim > 0 && hasNullElem, 1L).otherwise(0L))
        .as("n_nullelem"),
      sum(when(present && dim > 0 && !hasNullElem && nonfinite, 1L).otherwise(0L))
        .as("n_nonfinite"),
      sum(when(present && dim > 0 && !hasNullElem && !nonfinite && zero, 1L)
        .otherwise(0L)).as("n_zero"),
      sum(when(present && dim > 0 && !hasNullElem && !nonfinite && !zero, 1L)
        .otherwise(0L)).as("n_valid"))
  }
}

package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-safe equi-join — the executed form of the salting plan
  * stats.SkewAudit prescribes (P42 emits `salt` factors; this operator
  * spends them). A shuffle equi-join sends EVERY row of a key to ONE
  * reducer: a key owning 1/3 of a 10^12-row table turns one task into a
  * third of the cluster's work. Salting spreads it:
  *
  *  - probe (big) side: `_salt = per-ROW hash mod salts` — one key's rows
  *    fan out over `salts` reducers. The hash must NOT be a function of
  *    the join key alone (that would map each key back to one shard);
  *    any per-row column works — result is salt-invariant.
  *  - build (small) side: replicated `salts`× via explode of a literal
  *    range — bounded by |dim| × salts rows, the price of the technique.
  *  - join on (key, salt), salt dropped: the result is EXACTLY the plain
  *    equi-join, which the oracle certifies by running the UNSALTED join.
  *
  * When to use vs alternatives: broadcast beats salting whenever the dim
  * fits (no shuffle at all); AQE's skew split handles skew it can SEE at
  * runtime (post-shuffle partition sizes, PlanSpec pins it live) — but it
  * only splits the probe side of sort-merge/shuffled-hash joins it
  * re-plans, and a known-pathological key (SkewAudit ran yesterday)
  * shouldn't wait for runtime detection. Explicit salting is the
  * plan-level guarantee: the shape is skew-proof before the first task
  * launches, whatever the engine's runtime feature set.
  */
object SaltedJoin {

  /** Inner equi-join of `big` (probe, skewed) with `small` (build dim),
    * spread over `salts` shards. `saltOf` is the per-row salting column
    * (e.g. `xxhash64(col("event_id"))`) — see the class doc for why it
    * must vary WITHIN a key.
    */
  def inner(big: DataFrame, small: DataFrame, bigKey: String,
            smallKey: String, saltOf: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val probe = big.withColumn("_salt_p", pmod(saltOf, lit(salts.toLong)).cast("int"))
    val build = small.withColumn("_salt_b",
      explode(typedLit((0 until salts).toArray)))
    probe.join(build,
        probe(bigKey) === build(smallKey) && col("_salt_p") === col("_salt_b"))
      .drop("_salt_p", "_salt_b")
  }
}

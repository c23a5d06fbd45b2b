package graft

import org.apache.spark.sql.functions._
import graft.functions.exprs
import graft.gen.SyntheticTokens._

/** FuseGenChecks optimizer rule (active in every session via
  * spark.sql.extensions): fused checks over generated token arrays must
  * return exactly the unfused answers, with the generator pruned from the
  * plan once no consumer of the array remains.
  */
class FuseGenChecksSpec extends SparkTestBase {

  import spark.implicits._

  private def base = spark.range(0L, 5000L, 1L, 4)
    .select(col("id"),
      (lit(1L) + pmod(col("id") * NA + NB, lit(NTokMod))).cast("int").as("n"))

  test("in-tree shape fuses, prunes the generator, and a clean generator never violates") {
    val df = base.select(col("id"),
      exprs.array_int_bounds_violated(
        exprs.token_array_gen(col("id"), col("n"), TokA, TokB, TokC, Vocab),
        0, Vocab - 1).as("viol"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("token_gen_bounds_violated"), opt.take(400))
    assert(!opt.contains("token_array_gen"), opt.take(400))
    assert(df.filter(col("viol")).count() === 0L)
  }

  test("two-Project shape: fused bounds + size rewrite match the HOF control row-for-row") {
    val lo = 0L
    val hi = Vocab - 2000L // tight bound so violations actually occur
    val gen = base.select(col("id"), col("n"),
      exprs.token_array_gen(col("id"), col("n"), TokA, TokB, TokC, Vocab).as("toks"))
    val fused = gen.select(col("id"),
      exprs.array_int_bounds_violated(col("toks"), lo, hi).as("viol"),
      size(col("toks")).as("sz"))
    val opt = fused.queryExecution.optimizedPlan.toString
    assert(opt.contains("token_gen_bounds_violated"), opt.take(400))
    assert(!opt.contains("token_array_gen"),
      "generator must be pruned once every consumer of the array is fused")
    val control = base.select(col("id"),
      exists(transform(sequence(lit(0L), col("n").cast("long") - 1L),
        i => pmod(col("id") * TokA + i * TokB + TokC, lit(Vocab)).cast("int")),
        t => t < lo || t > hi).as("viol"),
      col("n").as("sz"))
    assert(fused.exceptAll(control).isEmpty, "fused rows not in control")
    assert(control.exceptAll(fused).isEmpty, "control rows not in fused")
    assert(fused.filter(col("viol")).count() > 0L) // non-vacuous
  }

  test("no fusion across the null-supplemented side of an outer join " +
       "(ADVICE r5): IsNull over a right-side generator stays correct") {
    // generator lives on the RIGHT of a LEFT OUTER join; unmatched left
    // rows null-supplement the array, so isnull(toks) must be TRUE there —
    // a fused column injected below the join would be null-supplemented to
    // NULL instead. The rule must leave this shape alone.
    val gen = base.filter(col("id") < 2500L).select(col("id").as("rid"),
      exprs.token_array_gen(col("id"), col("n"), TokA, TokB, TokC, Vocab).as("toks"))
    val joined = base.select(col("id"))
      .join(gen, col("id") === col("rid"), "left_outer")
      .select(col("id"), isnull(col("toks")).as("gone"))
    // matched rows: generator non-null => gone = false; unmatched: true
    val got = joined.groupBy(col("gone")).count().as[(Boolean, Long)]
      .collect().toMap
    assert(got === Map(false -> 2500L, true -> 2500L), got.toString)
  }

  test("null generator input yields null violated flag AND null size, as unfused") {
    val df = Seq((Option(7L), 5), (Option.empty[Long], 5)).toDF("id", "n")
      .select(col("id"),
        exprs.array_int_bounds_violated(
          exprs.token_array_gen(col("id"), col("n"), TokA, TokB, TokC, Vocab),
          0, Vocab - 1).as("viol"),
        size(exprs.token_array_gen(col("id"), col("n"), TokA, TokB, TokC, Vocab))
          .as("sz"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("token_array_gen"),
      "size rewrite must fire even for nullable inputs (If-guarded)")
    val rows = df.collect()
      .map(r => (r.isNullAt(0), r.isNullAt(1), if (r.isNullAt(2)) -1 else r.getInt(2)))
      .toSet
    assert(rows === Set((false, false, 5), (true, true, -1)))
  }
}

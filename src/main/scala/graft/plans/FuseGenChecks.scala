package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{ArrayIntBounds, TokenArrayGen, TokenGenBounds}

/** Producer/consumer loop fusion for generated token arrays (the measured
  * DRAM wall of the bench row pass — BENCH/BASELINE.md): validating a
  * GENERATED array never needs the array.
  *
  *   array_int_bounds_violated(token_array_gen(o, n), lo, hi)
  *     ⇒ token_gen_bounds_violated(o, n, lo, hi)   (register loop, no alloc)
  *   size(token_array_gen(o, n)) ⇒ if(isnull(o), null, n)
  *     (folds to plain n when o is non-nullable; n covers its own null)
  *
  * Handled shapes: the fused pair inside ONE expression tree, and the
  * ubiquitous two-Project shape (generator Project below, check Project
  * above) — there the fused check is appended to the LOWER project (where
  * the generator's inputs are in scope) and referenced from above. Once no
  * consumer of the array remains, ColumnPruning (same fixed-point batch —
  * this rule is injected as an operator-optimization rule) deletes the
  * TokenArrayGen alias outright: the row pass then allocates zero arrays,
  * ~2 KB/row of TLAB/DRAM traffic gone while every token is still computed
  * and checked.
  *
  * The size rewrite is sound because TokenArrayGen throws on n < 0 (no
  * plan that evaluates it with negative n completes) and is null exactly
  * when o or n is null — the If-guard reproduces that (see sizeOf).
  */
object FuseGenChecks extends Rule[LogicalPlan] {

  private def fuse(g: TokenArrayGen, lo: Long, hi: Long): TokenGenBounds =
    TokenGenBounds(g.orig, g.n, g.a, g.b, g.c, g.vocab, lo, hi)

  /** size(token_array_gen(o, n)) ⇒ n, null-corrected: the generated array
    * is null iff o or n is null, and size(null) is null — n already covers
    * its own null, so only a null o needs the guard. With non-nullable o
    * the If constant-folds away (IsNull(o) → false) in the same batch.
    * NOTE: a bare `!g.nullable => g.n` rewrite is nearly dead in practice —
    * any pmod/div in the n expression makes it nullable under Catalyst's
    * conservative nullability, which is exactly the shape the validation
    * suite generates (caught by FuseGenChecksSpec).
    */
  private def sizeOf(g: TokenArrayGen): Expression =
    if (!g.nullable) g.n
    else If(IsNull(g.orig),
      Literal.create(null, org.apache.spark.sql.types.IntegerType), g.n)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // shape 1: producer and consumer already in one tree. The Size rewrite
    // requires legacySizeOfNull=false: with spark.sql.legacy.sizeOfNull=true
    // size(null) is -1 while the rewrite yields NULL (ADVICE r3) — legacy
    // plans are simply left unfused.
    val local = plan.transformAllExpressions {
      case ArrayIntBounds(g: TokenArrayGen, lo, hi) => fuse(g, lo, hi)
      case Size(g: TokenArrayGen, false) => sizeOf(g)
    }
    // shape 2: consumer Project directly above the generator Project
    local.transformUp {
      case p @ Project(parentList, c: Project) =>
        val genById = c.projectList.collect {
          case al @ Alias(g: TokenArrayGen, _) => al.exprId -> g
        }.toMap
        if (genById.isEmpty) p
        else {
          val added = mutable.ArrayBuffer[NamedExpression]()
          val cache = mutable.Map[(ExprId, String), Attribute]()
          def shared(key: (ExprId, String), mk: => Expression): Attribute =
            cache.getOrElseUpdate(key, {
              val al = Alias(mk, s"_fused_${key._2}")()
              added += al
              al.toAttribute
            })
          val newParent = parentList.map(_.transformUp {
            case ArrayIntBounds(ar: AttributeReference, lo, hi)
                if genById.contains(ar.exprId) =>
              shared((ar.exprId, s"bounds_${lo}_$hi"),
                fuse(genById(ar.exprId), lo, hi))
            case Size(ar: AttributeReference, false)
                if genById.contains(ar.exprId) =>
              shared((ar.exprId, "size"), sizeOf(genById(ar.exprId)))
          }.asInstanceOf[NamedExpression])
          if (added.isEmpty) p
          else Project(newParent, Project(c.projectList ++ added, c.child))
        }
    }
  }
}

/** Session extensions: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (set as a JVM default in build.sbt / tools/runmain.sh so every forked
  * main and test picks it up).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => FuseGenChecks)
}

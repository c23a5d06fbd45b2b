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
  *   size(token_array_gen(o, n)) ⇒ n               (when the gen is non-null)
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
  * plan that evaluates it with negative n completes) and is null only when
  * an input is null (guarded by the nullability check).
  */
object FuseGenChecks extends Rule[LogicalPlan] {

  private def fuse(g: TokenArrayGen, lo: Long, hi: Long): TokenGenBounds =
    TokenGenBounds(g.orig, g.n, g.a, g.b, g.c, g.vocab, lo, hi)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // shape 1: producer and consumer already in one tree
    val local = plan.transformAllExpressions {
      case ArrayIntBounds(g: TokenArrayGen, lo, hi) => fuse(g, lo, hi)
      case Size(g: TokenArrayGen, _) if !g.nullable => g.n
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
            case Size(ar: AttributeReference, _)
                if genById.get(ar.exprId).exists(!_.nullable) =>
              shared((ar.exprId, "size"), genById(ar.exprId).n)
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

package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
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
  *   isnull(token_array_gen(o, n))    ⇒ isnull(o) OR isnull(n)
  *   isnotnull(token_array_gen(o, n)) ⇒ isnotnull(o) AND isnotnull(n)
  *     (TokenArrayGen is a default null-intolerant BinaryExpression: null
  *     exactly when an input is — required/present checks never need the
  *     array either, and an unfused IsNull was enough to keep the whole
  *     1 KB/row allocation alive in the scan)
  *
  * Handled shapes: the fused pair inside ONE expression tree, and —
  * round 5, generalizing the old two-Project special case — any consumer
  * Project/Filter separated from the generator Project by a chain of
  * Filter/Join nodes. That is exactly the fused row+ref validation scan
  * (Project(explode) over Filter(anyViolation) over BroadcastJoin over
  * Project(gen)): the fused check is appended as an alias to the
  * GENERATOR's own Project (where its inputs are in scope by
  * construction) and referenced from the consumer; the new attribute
  * flows up through Join/Filter unchanged. Aliases are deduplicated by
  * semantic equality, so the Filter and the explode Project above it
  * share one computed column instead of running the register loop twice.
  * Once no consumer of the array remains, ColumnPruning (same fixed-point
  * batch — this rule is injected as an operator-optimization rule)
  * deletes the TokenArrayGen alias outright: the validation scan then
  * allocates ZERO arrays — ~1 KB/row of TLAB/DRAM traffic gone while
  * every token is still computed and checked.
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

  private def isNullOf(g: TokenArrayGen): Expression =
    Or(IsNull(g.orig), IsNull(g.n))

  private def isNotNullOf(g: TokenArrayGen): Expression =
    And(IsNotNull(g.orig), IsNotNull(g.n))

  /** The Join sides a fused column may be read from / injected into:
    * only sides that are NEVER null-supplemented by the join. On the
    * null-supplemented side (right of LEFT OUTER, left of RIGHT OUTER,
    * both of FULL OUTER) the injected attribute would be nulled where the
    * original IsNull(array) is TRUE — a silent result change (ADVICE r5).
    * Current in-repo shapes keep generators on the stream side, so this
    * is purely defensive, but the rule runs on EVERY session plan.
    */
  private def fusableSides(j: Join): Seq[LogicalPlan] = j.joinType match {
    case org.apache.spark.sql.catalyst.plans.Inner |
         org.apache.spark.sql.catalyst.plans.Cross => Seq(j.left, j.right)
    case org.apache.spark.sql.catalyst.plans.LeftOuter |
         org.apache.spark.sql.catalyst.plans.LeftSemi |
         org.apache.spark.sql.catalyst.plans.LeftAnti => Seq(j.left)
    case org.apache.spark.sql.catalyst.plans.RightOuter => Seq(j.right)
    case _ => Seq.empty // FullOuter / Existence: conservatively none
  }

  /** Generator aliases visible from `p` descending ONLY through
    * Filter/Join nodes (an intervening Project/Aggregate changes scope —
    * those shapes are left to the in-tree rewrite after CollapseProject).
    */
  private def reachableGens(p: LogicalPlan): Map[ExprId, TokenArrayGen] = p match {
    case pr: Project => pr.projectList.collect {
      case al @ Alias(g: TokenArrayGen, _) => al.exprId -> g
    }.toMap
    case f: Filter => reachableGens(f.child)
    case j: Join =>
      fusableSides(j).map(reachableGens).foldLeft(
        Map.empty[ExprId, TokenArrayGen])(_ ++ _)
    case _ => Map.empty
  }

  /** Append `adds` to the Project that owns each generator exprId,
    * descending the same Filter/Join spine as [[reachableGens]].
    */
  private def inject(p: LogicalPlan,
                     adds: Map[ExprId, Seq[NamedExpression]]): LogicalPlan = p match {
    case pr: Project =>
      val mine = pr.projectList.collect {
        case al @ Alias(_: TokenArrayGen, _) if adds.contains(al.exprId) =>
          adds(al.exprId)
      }.flatten
      if (mine.isEmpty) pr else Project(pr.projectList ++ mine, pr.child)
    case f: Filter => f.copy(child = inject(f.child, adds))
    case j: Join =>
      val sides = fusableSides(j).toSet
      j.copy(
        left = if (sides.contains(j.left)) inject(j.left, adds) else j.left,
        right = if (sides.contains(j.right)) inject(j.right, adds) else j.right)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // shape 1: producer and consumer already in one tree. The Size rewrite
    // requires legacySizeOfNull=false: with spark.sql.legacy.sizeOfNull=true
    // size(null) is -1 while the rewrite yields NULL (ADVICE r3) — legacy
    // plans are simply left unfused.
    val local = plan.transformAllExpressions {
      case ArrayIntBounds(g: TokenArrayGen, lo, hi) => fuse(g, lo, hi)
      case Size(g: TokenArrayGen, false) => sizeOf(g)
      case IsNull(g: TokenArrayGen) => isNullOf(g)
      case IsNotNull(g: TokenArrayGen) => isNotNullOf(g)
    }
    // shape 2 (generalized): consumer Project/Filter above the generator
    // Project, any Filter/Join chain between. See object scaladoc.
    local.transformUp {
      case n @ (_: Project | _: Filter) if n.children.nonEmpty =>
        val genById = n.children.map(reachableGens).reduce(_ ++ _)
        if (genById.isEmpty) n
        else {
          val added = mutable.Map[ExprId, mutable.ArrayBuffer[NamedExpression]]()
          val cache = mutable.Map[(ExprId, String), Attribute]()
          // reuse an alias added by a LOWER consumer in an earlier
          // transformUp step (e.g. the Filter below this Project): the
          // generator's Project may already carry a semantically equal
          // fused column — referencing it beats computing the loop twice
          def existing(genId: ExprId, e: Expression): Option[Attribute] = {
            def find(p: LogicalPlan): Option[Attribute] = p match {
              case pr: Project =>
                if (pr.projectList.exists(al => al.exprId == genId))
                  pr.projectList.collectFirst {
                    case al: Alias if al.child.semanticEquals(e) => al.toAttribute
                  }
                else None
              case f: Filter => find(f.child)
              case j: Join => fusableSides(j).view.flatMap(find(_)).headOption
              case _ => None
            }
            n.children.view.flatMap(find(_)).headOption
          }
          def shared(genId: ExprId, kind: String, mk: => Expression): Attribute =
            cache.getOrElseUpdate((genId, kind), {
              val e = mk
              existing(genId, e).getOrElse {
                val al = Alias(e, s"_fused_$kind")()
                added.getOrElseUpdate(genId, mutable.ArrayBuffer()) += al
                al.toAttribute
              }
            })
          def rewrite(expr: Expression): Expression = expr.transformUp {
            case ArrayIntBounds(ar: AttributeReference, lo, hi)
                if genById.contains(ar.exprId) =>
              shared(ar.exprId, s"bounds_${lo}_$hi",
                fuse(genById(ar.exprId), lo, hi))
            case Size(ar: AttributeReference, false)
                if genById.contains(ar.exprId) =>
              shared(ar.exprId, "size", sizeOf(genById(ar.exprId)))
            case IsNull(ar: AttributeReference)
                if genById.contains(ar.exprId) =>
              shared(ar.exprId, "isnull", isNullOf(genById(ar.exprId)))
            case IsNotNull(ar: AttributeReference)
                if genById.contains(ar.exprId) =>
              shared(ar.exprId, "isnotnull", isNotNullOf(genById(ar.exprId)))
          }
          val n2 = n match {
            case p: Project =>
              p.copy(projectList =
                p.projectList.map(rewrite(_).asInstanceOf[NamedExpression]))
            case f: Filter => f.copy(condition = rewrite(f.condition))
          }
          if (added.isEmpty) n2
          else {
            val adds = added.view.mapValues(_.toSeq).toMap
            n2 match {
              case p: Project => p.copy(child = inject(p.child, adds))
              case f: Filter => f.copy(child = inject(f.child, adds))
            }
          }
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
